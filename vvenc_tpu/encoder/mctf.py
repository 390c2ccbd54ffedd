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

    init_mv: (nby, nbx, 2) integer MVs at this resolution."""
    h, w = cur.shape
    nby, nbx = (h + bs - 1) // bs, (w + bs - 1) // bs
    mvs = np.zeros((nby, nbx, 2), np.int32)
    err = np.zeros((nby, nbx), np.int64)
    rp = np.pad(ref, rng + bs, mode="edge").astype(np.int64)
    for by in range(nby):
        for bx in range(nbx):
            y0, x0 = by * bs, bx * bs
            blk = cur[y0:y0 + bs, x0:x0 + bs].astype(np.int64)
            bh, bw = blk.shape
            iy, ix = int(init_mv[by, bx, 1]), int(init_mv[by, bx, 0])
            best = None
            for dy in range(-rng, rng + 1):
                for dx in range(-rng, rng + 1):
                    sy = y0 + iy + dy + rng + bs
                    sx = x0 + ix + dx + rng + bs
                    cand = rp[sy:sy + bh, sx:sx + bw]
                    ssd = int(((blk - cand) ** 2).sum())
                    if best is None or ssd < best[0]:
                        best = (ssd, dx, dy)
            mvs[by, bx] = (ix + best[1], iy + best[2])
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


def motion_estimate(cur: np.ndarray, ref: np.ndarray, bs: int = 16):
    """3-level hierarchical ME; returns per-16x16 (mvs, err) full-res."""
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


def mctf_filter_frame(frames: List, idx: int, strength: float, qp: int,
                      input_bit_depth: int = 8, is_ld: bool = False):
    """Bilateral temporal filter of frames[idx] against +-RANGE neighbors.

    frames: list of (Y, U, V) uint8/uint16 planes; returns the filtered
    (Y, U, V) tuple (original dtype)."""
    cur = frames[idx]
    n = len(frames)
    refs = [j for j in range(max(0, idx - RANGE),
                             min(n, idx + RANGE + 1)) if j != idx]
    if not refs:
        return cur
    cur_y = cur[0].astype(np.int32)
    num = len(refs)
    bs = 16
    mvs_l = []
    errs = []
    for j in refs:
        mvs, err = motion_estimate(cur_y, frames[j][0].astype(np.int32), bs)
        mvs_l.append(mvs)
        errs.append(err)

    maxv = (1 << input_bit_depth) - 1
    bd_w = 1024.0 / (maxv + 1)
    luma_sigma_sq = SIGMA_MULT * (128.0 + 3.0 / 256.0 * qp ** 3) \
        / (bd_w * bd_w)
    chroma_sigma_sq = 30.0 * 30.0 / (bd_w * bd_w)
    row = 1 if is_ld else 0
    out_planes = []
    for comp in range(3):
        sc = 0 if comp == 0 else 1
        src = cur[comp].astype(np.float64)
        h, w = src.shape
        sigma_sq = luma_sigma_sq if comp == 0 else chroma_sigma_sq
        weight_scaling = strength * (CHROMA_FACTOR if comp else 0.4)
        wsum = np.ones((h, w), np.float64)
        acc = src.copy()
        for k, j in enumerate(refs):
            corrected = _mc_plane(frames[j][comp].astype(np.int32),
                                  mvs_l[k], bs, sc).astype(np.float64)
            d_poc = abs(idx - j)
            ref_str = REF_STRENGTHS[row][min(d_poc, 6) - 1]
            diff = corrected - src
            # per-16x16-block noise/error factors (applyBlockCore:440-490)
            berr = errs[k] / (bs * bs)  # mean SSD per pixel
            ww_blk = np.where(berr < 50, 1.2, np.where(berr > 100, 0.6,
                                                       1.0))
            min_err = np.minimum.reduce([e / (bs * bs) for e in errs])
            ww_blk = ww_blk * (min_err + 1.0) / (berr + 1.0)
            # expand to pixels of this component
            ww_pix = np.repeat(np.repeat(ww_blk, bs >> sc, 0),
                               bs >> sc, 1)[:h, :w]
            wgt = (weight_scaling * ref_str) * ww_pix * \
                np.exp(-diff * diff / (2 * sigma_sq))
            acc += wgt * corrected
            wsum += wgt
        out = np.clip(np.round(acc / wsum - 0.0), 0, maxv)
        out_planes.append(out.astype(cur[comp].dtype))
    return tuple(out_planes)


def apply_mctf(frames: List, gop_size: int, qp: int,
               input_bit_depth: int = 8):
    """Filter all sub-GOP boundary frames; returns a new frame list."""
    mf, ms = mctf_strengths(gop_size, qp)
    out = list(frames)
    for i in range(len(frames)):
        sidx = -1
        for k in range(len(mf)):
            if i % mf[k] == 0:
                sidx = k
        if sidx < 0:
            continue
        out[i] = mctf_filter_frame(frames, i, ms[sidx], qp,
                                   input_bit_depth)
    return out
