"""MCTF: GOP-based motion-compensated temporal pre-filtering.

Structural analog of vvenc CommonLib/MCTF.cpp: hierarchical luma motion
estimation over a downsampling pyramid, per-block motion-compensated
reference alignment, and the bilateral temporal filter with QP-adaptive
sigma and per-reference strengths (applyBlockCore:419, bilateralFilter
sigma derivation:1359, m_refStrengths:112, defaults vvencCfg.cpp:1521).

Encoder-side only (non-normative): filters the ORIGINAL frames at sub-GOP
boundaries before encoding.  numpy reference path; the ME inner loops ride
the batched JAX SAD kernels when available.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

CHROMA_FACTOR = 0.55
SIGMA_MULT = 9.0
# per |poc offset| 1..6 (row 0: random access, row 1: low delay)
REF_STRENGTHS = ((0.84375, 0.6, 0.4286, 0.3333, 0.2727, 0.2308),
                 (1.125, 1.0, 0.7143, 0.5556, 0.4545, 0.3846))
RANGE = 2  # frames each side (vvenc m_range = VVENC_MCTF_RANGE - 2)


def mctf_strengths(gop_size: int, qp: int, num: int = 2):
    """Default MCTFFrames/MCTFStrengths (vvencCfg.cpp:1519-1524)."""
    frames = [gop_size >> (num - i - 1) for i in range(num)]
    strengths = [min(2.0, max(0.0, (qp - 4.0) / 8.0)) / (num - i)
                 for i in range(num)]
    strengths[num - 1] = min(1.5, max(0.0, (qp - 4.0) * 3.0 / 32.0))
    return frames, strengths


def _downsample2(p: np.ndarray) -> np.ndarray:
    h, w = p.shape
    h2, w2 = h // 2, w // 2
    q = p[:h2 * 2, :w2 * 2].astype(np.int32)
    return (q[0::2, 0::2] + q[1::2, 0::2] + q[0::2, 1::2]
            + q[1::2, 1::2] + 2) >> 2


def _block_me(cur: np.ndarray, ref: np.ndarray, bs: int, rng: int,
              init_mv: np.ndarray):
    """Integer full search per bs-block around init_mv; returns (mvs, err).

    init_mv: (nby, nbx, 2) integer MVs at this resolution.  Vectorized
    over blocks per candidate displacement (same SSDs, same first-wins
    tie-break as the scalar loop); partial edge blocks keep the scalar
    path."""
    h, w = cur.shape
    from .. import native as _native
    if _native.available():
        return _native.mctf_block_me(cur, ref, bs, rng, init_mv)
    nby, nbx = (h + bs - 1) // bs, (w + bs - 1) // bs
    mvs = np.zeros((nby, nbx, 2), np.int32)
    err = np.zeros((nby, nbx), np.int64)
    rp = np.pad(ref, rng + bs, mode="edge").astype(np.int64)

    fy, fx = h // bs, w // bs          # full-block grid
    if fy and fx:
        blk = cur[:fy * bs, :fx * bs].astype(np.int64) \
            .reshape(fy, bs, fx, bs).transpose(0, 2, 1, 3)
        y0 = (np.arange(fy) * bs)[:, None]
        x0 = (np.arange(fx) * bs)[None, :]
        iy = init_mv[:fy, :fx, 1].astype(np.int64)
        ix = init_mv[:fy, :fx, 0].astype(np.int64)
        ay = np.arange(bs)
        best_ssd = None
        best_d = None
        for dy in range(-rng, rng + 1):
            sy = np.clip(y0 + iy + dy + rng + bs, 0, rp.shape[0] - bs)
            ys = sy[..., None] + ay                      # [fy, fx, bs]
            for dx in range(-rng, rng + 1):
                sx = np.clip(x0 + ix + dx + rng + bs, 0,
                             rp.shape[1] - bs)
                xs = sx[..., None] + ay
                win = rp[ys[:, :, :, None], xs[:, :, None, :]]
                d = blk - win
                ssd = np.einsum("abij,abij->ab", d, d)
                if best_ssd is None:
                    best_ssd = ssd
                    best_d = np.full((fy, fx, 2), (dx, dy), np.int64)
                else:
                    m = ssd < best_ssd
                    best_ssd = np.where(m, ssd, best_ssd)
                    best_d[m] = (dx, dy)
        mvs[:fy, :fx, 0] = ix + best_d[:, :, 0]
        mvs[:fy, :fx, 1] = iy + best_d[:, :, 1]
        err[:fy, :fx] = best_ssd

    # partial edge blocks (right column / bottom row): scalar
    edge = [(by, bx) for by in range(nby) for bx in range(nbx)
            if by >= fy or bx >= fx]
    for by, bx in edge:
        y0_, x0_ = by * bs, bx * bs
        blk1 = cur[y0_:y0_ + bs, x0_:x0_ + bs].astype(np.int64)
        bh, bw = blk1.shape
        iy1, ix1 = int(init_mv[by, bx, 1]), int(init_mv[by, bx, 0])
        best = None
        for dy in range(-rng, rng + 1):
            for dx in range(-rng, rng + 1):
                sy = min(max(y0_ + iy1 + dy + rng + bs, 0),
                         rp.shape[0] - bh)
                sx = min(max(x0_ + ix1 + dx + rng + bs, 0),
                         rp.shape[1] - bw)
                cand = rp[sy:sy + bh, sx:sx + bw]
                ssd = int(((blk1 - cand) ** 2).sum())
                if best is None or ssd < best[0]:
                    best = (ssd, dx, dy)
        mvs[by, bx] = (ix1 + best[1], iy1 + best[2])
        err[by, bx] = best[0]
    return mvs, err


def _upscale_mv(mvs: np.ndarray, nby: int, nbx: int) -> np.ndarray:
    """Double the MV magnitude and resolution of the block grid."""
    out = np.zeros((nby, nbx, 2), np.int32)
    sby, sbx = mvs.shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            out[by, bx] = 2 * mvs[min(by // 2, sby - 1),
                                  min(bx // 2, sbx - 1)]
    return out


# MCTF fractional-sample filters, 16 phases (vvenc MCTF.cpp:72-110;
# the 8-entry table's taps 1..6 form the applied 6-tap filter)
MCTF_FILTER8 = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0], [0, 1, -3, 64, 4, -2, 0, 0],
    [0, 1, -6, 62, 9, -3, 1, 0], [0, 2, -8, 60, 14, -5, 1, 0],
    [0, 2, -9, 57, 19, -7, 2, 0], [0, 3, -10, 53, 24, -8, 2, 0],
    [0, 3, -11, 50, 29, -9, 2, 0], [0, 3, -11, 44, 35, -10, 3, 0],
    [0, 1, -7, 38, 38, -7, 1, 0], [0, 3, -10, 35, 44, -11, 3, 0],
    [0, 2, -9, 29, 50, -11, 3, 0], [0, 2, -8, 24, 53, -10, 3, 0],
    [0, 2, -7, 19, 57, -9, 2, 0], [0, 1, -5, 14, 60, -8, 2, 0],
    [0, 1, -3, 9, 62, -6, 1, 0], [0, 0, -2, 4, 64, -3, 1, 0]], np.int32)
MCTF_FILTER4 = np.array([
    [0, 64, 0, 0], [-2, 62, 4, 0], [-2, 58, 10, -2], [-4, 56, 14, -2],
    [-4, 54, 16, -2], [-6, 52, 20, -2], [-6, 46, 28, -4], [-4, 42, 30, -4],
    [-4, 36, 36, -4], [-4, 30, 42, -4], [-4, 28, 46, -6], [-2, 20, 52, -6],
    [-2, 16, 54, -4], [-2, 14, 56, -4], [-2, 10, 58, -2], [0, 4, 62, -2]],
    np.int32)

_PAD = 64   # covers the hierarchical ME's maximum integer MV


def _interp_plane_mctf(plane: np.ndarray, fx: int, fy: int, taps8: bool,
                       bit_depth: int) -> np.ndarray:
    """Whole-plane MCTF fractional interpolation at phase (fx, fy)
    (vvenc applyFrac8Core_6Tap / _4Tap, MCTF.cpp:259-360): horizontal
    6- or 4-tap with (1<<5)>>6 rounding, then vertical, clip.  The
    returned plane is edge-padded by _PAD on every side; index
    [y + _PAD, x + _PAD] gives the sample at integer position (x, y)."""
    maxv = (1 << bit_depth) - 1
    from .. import native as _native
    if _native.available():
        if taps8:
            return _native.mctf_interp(plane, MCTF_FILTER8[fx][1:7],
                                       MCTF_FILTER8[fy][1:7], -2, _PAD,
                                       bit_depth)
        return _native.mctf_interp(plane, MCTF_FILTER4[fx],
                                   MCTF_FILTER4[fy], -1, _PAD, bit_depth)
    p = np.pad(plane, _PAD + 4, mode="edge").astype(np.int32)
    if taps8:
        taps = MCTF_FILTER8[fx][1:7]
        offs = range(-2, 4)            # rowStart[1..6] with centre tap 3
    else:
        taps = MCTF_FILTER4[fx]
        offs = range(-1, 3)            # taps 0..3 at bx-1..bx+2 (centre 1)
    tmp = np.zeros_like(p)
    for t, o in zip(taps, offs):
        if t:
            tmp += int(t) * np.roll(p, -o, axis=1)
    tmp = (tmp + 32) >> 6
    if taps8:
        tapsv = MCTF_FILTER8[fy][1:7]
    else:
        tapsv = MCTF_FILTER4[fy]
    out = np.zeros_like(p)
    for t, o in zip(tapsv, offs):
        if t:
            out += int(t) * np.roll(tmp, -o, axis=0)
    out = np.clip((out + 32) >> 6, 0, maxv)
    return out[4:-4, 4:-4]


class _InterpCache:
    """Per-reference lazy cache of phase-interpolated planes."""

    def __init__(self, plane, taps8, bit_depth):
        self.plane = plane
        self.taps8 = taps8
        self.bit_depth = bit_depth
        self._c = {}

    def get(self, fx: int, fy: int) -> np.ndarray:
        key = (fx, fy)
        if key not in self._c:
            self._c[key] = _interp_plane_mctf(self.plane, fx, fy,
                                              self.taps8, self.bit_depth)
        return self._c[key]


def _ssd_blocks(cur, ic: _InterpCache, bxy, mvq, bs):
    """SSD per block for 1/16-pel MVs mvq [n, 2] at block origins
    bxy [n, 2] (x, y), vectorized per phase group."""
    n = len(mvq)
    from .. import native as _native
    if _native.available():
        return _native.mctf_block_ssd(ic.plane, cur, bxy, mvq, bs,
                                      ic.bit_depth)
    out = np.empty(n, np.int64)
    fx = mvq[:, 0] & 15
    fy = mvq[:, 1] & 15
    ix = mvq[:, 0] >> 4
    iy = mvq[:, 1] >> 4
    for pf in set(zip(fx.tolist(), fy.tolist())):
        sel = np.nonzero((fx == pf[0]) & (fy == pf[1]))[0]
        ip = ic.get(*pf)
        sw = np.lib.stride_tricks.sliding_window_view(ip, (bs, bs))
        ys = np.clip(bxy[sel, 1] + iy[sel] + _PAD, 0, sw.shape[0] - 1)
        xs = np.clip(bxy[sel, 0] + ix[sel] + _PAD, 0, sw.shape[1] - 1)
        d = sw[ys, xs].astype(np.int64) - cur[sel]
        out[sel] = (d * d).sum(axis=(1, 2))
    return out


def _subpel_refine(cur: np.ndarray, ref: np.ndarray, mvs, err, bs,
                   bit_depth):
    """1/16-pel ME refinement (vvenc estimateLumaLn doubleRes iterations,
    MCTF.cpp:1250-1290: +-2/16 then +-1/16 around the best).  mvs are
    integer pels in, 1/16-pel units out; err updated to the subpel SSD."""
    h, w = cur.shape
    nby, nbx = mvs.shape[:2]
    # zero-padded int32 block stack, built in one vectorized pass (int32
    # and contiguous so the native SSD kernel gets a zero-copy view)
    ph, pw = nby * bs, nbx * bs
    grid = np.zeros((ph, pw), np.int32)
    grid[:h, :w] = cur
    blocks = np.ascontiguousarray(
        grid.reshape(nby, bs, nbx, bs).transpose(0, 2, 1, 3)
        .reshape(nby * nbx, bs, bs))
    bxy = np.ascontiguousarray(
        np.stack(np.meshgrid(np.arange(nbx) * bs, np.arange(nby) * bs),
                 axis=-1).reshape(-1, 2).astype(np.int32))
    mvq = (mvs.reshape(-1, 2) * 16).astype(np.int32)
    ic = _InterpCache(ref, True, bit_depth)
    best = _ssd_blocks(blocks, ic, bxy, mvq, bs)
    for step in (2, 1):
        base = mvq.copy()
        for oy in (-step, 0, step):
            for ox in (-step, 0, step):
                if ox == 0 and oy == 0:
                    continue
                cand = base + np.asarray([ox, oy], np.int32)
                c = _ssd_blocks(blocks, ic, bxy, cand, bs)
                better = c < best
                best = np.where(better, c, best)
                mvq = np.where(better[:, None], cand, mvq)
    return (mvq.reshape(nby, nbx, 2), best.reshape(nby, nbx), ic)


def motion_estimate(cur: np.ndarray, ref: np.ndarray, bs: int = 16,
                    subpel: bool = False, bit_depth: int = 8):
    """3-level hierarchical ME; returns per-16x16 (mvs, err) full-res.

    subpel: refine to 1/16-pel (vvenc MCTF doubleRes stage) — returns
    (mvs_q16, err, interp_cache) instead."""
    c2, r2 = _downsample2(cur), _downsample2(ref)
    c4, r4 = _downsample2(c2), _downsample2(r2)
    h4, w4 = c4.shape
    nb4 = ((h4 + bs - 1) // bs, (w4 + bs - 1) // bs)
    mv4, _ = _block_me(c4, r4, bs, 8, np.zeros((*nb4, 2), np.int32))
    h2, w2 = c2.shape
    nb2 = ((h2 + bs - 1) // bs, (w2 + bs - 1) // bs)
    mv2, _ = _block_me(c2, r2, bs, 2, _upscale_mv(mv4, *nb2))
    h, w = cur.shape
    nb1 = ((h + bs - 1) // bs, (w + bs - 1) // bs)
    mv1, err = _block_me(cur, ref, bs, 2, _upscale_mv(mv2, *nb1))
    if subpel:
        return _subpel_refine(cur, ref, mv1, err, bs, bit_depth)
    return mv1, err


def _mc_plane(ref: np.ndarray, mvs: np.ndarray, bs: int,
              scale: int) -> np.ndarray:
    """Motion-compensate a full plane per bs-block (integer MVs; scale
    halves MVs for chroma)."""
    h, w = ref.shape
    out = np.empty_like(ref)
    rp = np.pad(ref, 256, mode="edge")
    for by in range(mvs.shape[0]):
        for bx in range(mvs.shape[1]):
            y0, x0 = by * (bs >> scale), bx * (bs >> scale)
            if y0 >= h or x0 >= w:
                continue
            bh = min(bs >> scale, h - y0)
            bw = min(bs >> scale, w - x0)
            mx = int(mvs[by, bx, 0]) >> scale
            my = int(mvs[by, bx, 1]) >> scale
            out[y0:y0 + bh, x0:x0 + bw] = \
                rp[256 + y0 + my:256 + y0 + my + bh,
                   256 + x0 + mx:256 + x0 + mx + bw]
    return out


def _bim_stats(cur_y, errs, refs, idx, bs, input_bit_depth, ctu_size,
               qp, strength, min_noise):
    """Per-CTU BIM QP offsets + min-noise update from the MCTF ME errors
    (vvenc MCTF.cpp:869-1056: normalized block error MCTF.cpp:1318,
    cuTree thresholds :119-120, zero-mean normalization :1048-1054)."""
    h, w = cur_y.shape
    nby, nbx = (h + bs - 1) // bs, (w + bs - 1) // bs
    bd_scale = float(1 << (2 * (10 - input_bit_depth)))
    # per-block variance of the current frame (10-bit scale)
    ph, pw = nby * bs, nbx * bs
    cp = np.zeros((ph, pw), np.float64)
    cp[:h, :w] = cur_y
    blocks = cp.reshape(nby, bs, nbx, bs).transpose(0, 2, 1, 3)
    var = blocks.var(axis=(2, 3)) * (bs * bs) * bd_scale
    n_cx = (w + ctu_size - 1) // ctu_size
    n_cy = (h + ctu_size - 1) // ctu_size
    n_ctu = n_cx * n_cy
    bx_ctu = np.minimum(np.arange(nbx) * bs // ctu_size, n_cx - 1)
    by_ctu = np.minimum(np.arange(nby) * bs // ctu_size, n_cy - 1)
    ctu_of_blk = by_ctu[:, None] * n_cx + bx_ctu[None, :]
    sum_err = np.zeros((2, n_ctu))
    sum_rms = np.zeros((2, n_ctu))
    blk_cnt = np.zeros((2, n_ctu))
    dist_factor = [3, 3]
    for k, j in enumerate(refs):
        d = abs(idx - j)
        if d > 2:
            continue
        dist_factor[d - 1] -= 1
        mse = errs[k] * bd_scale / (bs * bs)
        err_n = 20.0 * ((errs[k] * bd_scale + 5.0) / (var + 5.0)) \
            + mse / 50.0
        rms = np.sqrt(mse)
        np.add.at(sum_err[d - 1], ctu_of_blk.ravel(), err_n.ravel())
        np.add.at(sum_rms[d - 1], ctu_of_blk.ravel(), rms.ravel())
        np.add.at(blk_cnt[d - 1], ctu_of_blk.ravel(), 1.0)
    if dist_factor[0] >= 3 or dist_factor[1] >= 3:
        return np.zeros(n_ctu, np.int32)
    # min-noise levels from the motion rms (MCTF.cpp:915-928; rms scale
    # "to 12 bit" via bd12bScale=4 for <12-bit internals)
    if min_noise is not None:
        from .qpa import update_min_noise_levels
        for ci in range(n_ctu):
            x0 = (ci % n_cx) * ctu_size
            y0 = (ci // n_cx) * ctu_size
            avg = int(cur_y[y0:y0 + ctu_size, x0:x0 + ctu_size].mean())
            srms = min(sum_rms[0][ci], sum_rms[1][ci])
            mean_in_ctu = 4.0 * srms / max(1.0, blk_cnt[0][ci])
            update_min_noise_levels(min_noise, 10,
                                    avg << (10 - input_bit_depth),
                                    mean_in_ctu)
    weight = min(1.0, strength)
    off = np.zeros(n_ctu, np.int32)
    for ci in range(n_ctu):
        e1 = (sum_err[0][ci] / max(1.0, blk_cnt[0][ci])) * dist_factor[0]
        e2 = (sum_err[1][ci] / max(1.0, blk_cnt[1][ci])) * dist_factor[1]
        werr = max(e1, e2) + abs(e2 - e1) * 3
        werr = int(werr * weight + (1 - weight) * 45.0)  # m_cuTreeCenter
        if werr > 75:
            off[ci] = 2
        elif werr > 60:
            off[ci] = 1
        elif werr < 15:
            off[ci] = -2
        elif werr < 30:
            off[ci] = -1
    s = int(off.sum())
    avg = (s + (-(n_ctu >> 1) if s < 0 else (n_ctu >> 1))) // n_ctu
    return (off - avg).astype(np.int32)


def _mc_plane_subpel(ref: np.ndarray, mvq, bs: int, scale: int,
                     taps8: bool, bit_depth: int, ic=None) -> np.ndarray:
    """Motion-compensate a plane per bs-block with 1/16-pel MVs through
    the MCTF fractional filters (vvenc applyBlock MC, MCTF.cpp:1450-1475:
    chroma scales the MV by the component shift)."""
    h, w = ref.shape
    from .. import native as _native
    if _native.available():
        return _native.mctf_mc_plane(ref, mvq, bs, scale, taps8,
                                     bit_depth).astype(ref.dtype)
    out = np.empty_like(ref)
    if ic is None:
        ic = _InterpCache(ref, taps8, bit_depth)
    bsc = bs >> scale
    for by in range(mvq.shape[0]):
        for bx in range(mvq.shape[1]):
            y0, x0 = by * bsc, bx * bsc
            if y0 >= h or x0 >= w:
                continue
            bh, bw = min(bsc, h - y0), min(bsc, w - x0)
            dx = int(mvq[by, bx, 0]) >> scale
            dy = int(mvq[by, bx, 1]) >> scale
            ip = ic.get(dx & 15, dy & 15)
            ys = min(max(_PAD + y0 + (dy >> 4), 0), ip.shape[0] - bh)
            xs = min(max(_PAD + x0 + (dx >> 4), 0), ip.shape[1] - bw)
            out[y0:y0 + bh, x0:x0 + bw] = ip[ys:ys + bh, xs:xs + bw]
    return out


def mctf_filter_frame(frames: List, idx: int, strength: float, qp: int,
                      input_bit_depth: int = 8, is_ld: bool = False,
                      bim_ctu_size: int = 0, min_noise=None):
    """Bilateral temporal filter of frames[idx] against +-RANGE neighbors.

    frames: list of (Y, U, V) uint8/uint16 planes; returns the filtered
    (Y, U, V) tuple (original dtype), or ((Y, U, V), bim_offsets) when
    bim_ctu_size > 0."""
    cur = frames[idx]
    n = len(frames)
    refs = [j for j in range(max(0, idx - RANGE),
                             min(n, idx + RANGE + 1)) if j != idx]
    if not refs:
        return (cur, None) if bim_ctu_size else cur
    cur_y = cur[0].astype(np.int32)
    num = len(refs)
    bs = 16
    mvs_l = []    # 1/16-pel MVs (subpel-refined, MCTF.cpp doubleRes)
    errs = []
    ics = []      # per-ref luma interpolation caches (reused by the MC)
    for j in refs:
        mvq, err, ic = motion_estimate(
            cur_y, frames[j][0].astype(np.int32), bs, subpel=True,
            bit_depth=input_bit_depth)
        mvs_l.append(mvq)
        errs.append(err)
        ics.append(ic)
    bim = None
    if bim_ctu_size:
        bim = _bim_stats(cur_y, errs, refs, idx, bs, input_bit_depth,
                         bim_ctu_size, qp, strength, min_noise)

    maxv = (1 << input_bit_depth) - 1
    bd_w = 1024.0 / (maxv + 1)
    luma_sigma_sq = SIGMA_MULT * (128.0 + 3.0 / 256.0 * qp ** 3) \
        / (bd_w * bd_w)
    chroma_sigma_sq = 30.0 * 30.0 / (bd_w * bd_w)
    row = 1 if is_ld else 0
    # per-block minimum error across refs is loop-invariant — hoist
    min_err = np.minimum.reduce([e / (bs * bs) for e in errs])
    out_planes = []
    for comp in range(3):
        sc = 0 if comp == 0 else 1
        src = cur[comp].astype(np.float32)
        h, w = src.shape
        sigma_sq = luma_sigma_sq if comp == 0 else chroma_sigma_sq
        weight_scaling = strength * (CHROMA_FACTOR if comp else 0.4)
        wsum = np.ones((h, w), np.float32)
        acc = src.copy()
        inv2s = np.float32(-1.0 / (2 * sigma_sq))
        for k, j in enumerate(refs):
            corrected = _mc_plane_subpel(
                frames[j][comp].astype(np.int32), mvs_l[k], bs, sc,
                taps8=(comp == 0), bit_depth=input_bit_depth,
                ic=ics[k] if comp == 0 else None).astype(np.float32)
            d_poc = abs(idx - j)
            ref_str = REF_STRENGTHS[row][min(d_poc, 6) - 1]
            diff = corrected - src
            # per-16x16-block noise/error factors (applyBlockCore:440-490)
            berr = errs[k] / (bs * bs)  # mean SSD per pixel
            ww_blk = np.where(berr < 50, 1.2, np.where(berr > 100, 0.6,
                                                       1.0))
            ww_blk = (ww_blk * (min_err + 1.0) / (berr + 1.0)) \
                .astype(np.float32)
            # expand to pixels of this component (broadcast view, one
            # materializing reshape instead of two repeat copies)
            sbs = bs >> sc
            nby, nbx = ww_blk.shape
            ww_pix = np.broadcast_to(
                ww_blk[:, None, :, None], (nby, sbs, nbx, sbs)) \
                .reshape(nby * sbs, nbx * sbs)[:h, :w]
            wgt = (np.float32(weight_scaling * ref_str) * ww_pix) * \
                np.exp(diff * diff * inv2s)
            acc += wgt * corrected
            wsum += wgt
        out = np.clip(np.round(acc / wsum - 0.0), 0, maxv)
        out_planes.append(out.astype(cur[comp].dtype))
    if bim_ctu_size:
        return tuple(out_planes), bim
    return tuple(out_planes)


def apply_mctf(frames: List, gop_size: int, qp: int,
               input_bit_depth: int = 8, bim_ctu_size: int = 0,
               min_noise=None, poc_offset: int = 0):
    """Filter all sub-GOP boundary frames; returns a new frame list, or
    (frames, {poc: per-CTU BIM QP offsets}) when bim_ctu_size > 0
    (block importance mapping, vvenc MCTF.cpp BIM path; min_noise, when
    given, is updated in place with the motion-noise estimates).

    poc_offset shifts the filter-period phase: segment-mode encodes pass
    -lead_frames so local indices filter exactly like their global POCs
    in the one-shot encode (segments start at intra-period boundaries,
    multiples of every filter period)."""
    mf, ms = mctf_strengths(gop_size, qp)
    out = list(frames)
    bim_map = {}
    for i in range(len(frames)):
        sidx = -1
        for k in range(len(mf)):
            if (i + poc_offset) % mf[k] == 0:
                sidx = k
        if sidx < 0:
            continue
        if bim_ctu_size:
            out[i], bim = mctf_filter_frame(
                frames, i, ms[sidx], qp, input_bit_depth,
                bim_ctu_size=bim_ctu_size, min_noise=min_noise)
            if bim is not None:
                bim_map[i] = bim
        else:
            out[i] = mctf_filter_frame(frames, i, ms[sidx], qp,
                                       input_bit_depth)
    if bim_ctu_size:
        return out, bim_map
    return out
