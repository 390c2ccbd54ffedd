"""Motion-compensation interpolation filters (H.266 8.5.6.3).

8-tap luma / 4-tap chroma separable filters at 1/16 (chroma 1/32) pel
phases.  Behavioral reference: vvenc CommonLib/InterpolationFilter.cpp:85
(m_lumaFilter), :107 (m_chromaFilter), filter arithmetic (shift/offset
conventions with the 14-bit intermediate precision) per
InterpolationFilter::filter<>.

numpy golden path + JAX batched path (batch of equal-size blocks at one
fractional phase — the encoder groups blocks by phase; full-phase sweeps
for fractional ME evaluate all 16 phases as one batched program).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .intra import CHROMA_FILTER  # 32-phase 4-tap (shared with intra)

IF_INTERNAL_PREC = 14
IF_FILTER_PREC = 6
IF_INTERNAL_OFFS = 1 << (IF_INTERNAL_PREC - 1)

# 16-phase 8-tap luma filter (H.266 Table 34)
LUMA_FILTER = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [0, 1, -3, 63, 4, -2, 1, 0],
    [-1, 2, -5, 62, 8, -3, 1, 0],
    [-1, 3, -8, 60, 13, -4, 1, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 52, 26, -8, 3, -1],
    [-1, 3, -9, 47, 31, -10, 4, -1],
    [-1, 4, -11, 45, 34, -10, 4, -1],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [-1, 4, -10, 34, 45, -11, 4, -1],
    [-1, 4, -10, 31, 47, -9, 3, -1],
    [-1, 3, -8, 26, 52, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
    [0, 1, -4, 13, 60, -8, 3, -1],
    [0, 1, -3, 8, 62, -5, 2, -1],
    [0, 1, -2, 4, 63, -3, 1, 0]], dtype=np.int32)

NTAPS_LUMA = 8
NTAPS_CHROMA = 4


def _filter_1d(src, taps, axis, is_first, is_last, bit_depth):
    """One separable filter stage with the normative shift/offset scheme."""
    head_room = IF_INTERNAL_PREC - bit_depth
    shift = IF_FILTER_PREC
    if is_last:
        shift += 0 if is_first else head_room
        offset = 1 << (shift - 1)
        offset += 0 if is_first else IF_INTERNAL_OFFS << IF_FILTER_PREC
    else:
        shift -= head_room if is_first else 0
        offset = (-IF_INTERNAL_OFFS << shift) if is_first else 0
    n = len(taps)
    acc = np.zeros([s - n + 1 if a == axis else s
                    for a, s in enumerate(src.shape)], dtype=np.int64)
    for k in range(n):
        sl = [slice(None)] * src.ndim
        sl[axis] = slice(k, k + acc.shape[axis])
        acc += int(taps[k]) * src[tuple(sl)].astype(np.int64)
    val = (acc + offset) >> shift
    if is_last:
        val = np.clip(val, 0, (1 << bit_depth) - 1)
    return val


# 6-tap alternative half-pel luma filter (AMVR half-pel mode; vvenc
# InterpolationFilter.cpp:106 m_lumaAltHpelIFilter)
ALT_HPEL_FILTER = np.array([0, 3, 9, 20, 20, 9, 3, 0], dtype=np.int32)

# BCW weights (vvenc Rom.cpp:1152)
BCW_WEIGHTS = (-2, 3, 4, 5, 10)
BCW_DEFAULT = 2


def mc_block_np(ref_plane: np.ndarray, x: int, y: int, w: int, h: int,
                mv_x: int, mv_y: int, bit_depth: int = 10,
                is_luma: bool = True, intermediate: bool = False,
                alt_hpel: bool = False,
                taps_override: np.ndarray = None) -> np.ndarray:
    """Motion-compensated prediction of one block.

    mv in units of 1/16 luma pel (1/32 chroma pel for chroma planes with
    the chroma mv convention already applied by the caller).
    ref_plane is border-padded by replication on demand.
    intermediate=True returns the 14-bit biased intermediate used for
    bi-prediction averaging (isLast=false path).

    Dispatches to the native kernel (vte_mc_block) when loaded — the MC
    filter is the RD loop's hottest host op (InterpolationFilterX86.h
    analog); `_mc_block_py` below is the golden model
    (tests/test_native.py fuzzes native vs python)."""
    from .. import native
    if native.available() and ref_plane.dtype == np.int32 \
            and ref_plane.flags.c_contiguous:
        return native.mc_block(ref_plane, x, y, w, h, mv_x, mv_y,
                               bit_depth, is_luma, intermediate, alt_hpel,
                               taps_override)
    return _mc_block_py(ref_plane, x, y, w, h, mv_x, mv_y, bit_depth,
                        is_luma, intermediate, alt_hpel, taps_override)


def _mc_block_py(ref_plane: np.ndarray, x: int, y: int, w: int, h: int,
                 mv_x: int, mv_y: int, bit_depth: int = 10,
                 is_luma: bool = True, intermediate: bool = False,
                 alt_hpel: bool = False,
                 taps_override: np.ndarray = None) -> np.ndarray:
    """Pure-python golden MC (see mc_block_np)."""
    if is_luma:
        frac_bits, taps_tbl, ntaps = 4, LUMA_FILTER, NTAPS_LUMA
        if taps_override is not None:
            taps_tbl = taps_override   # e.g. the 6-tap affine luma filter
    else:
        frac_bits, taps_tbl, ntaps = 5, CHROMA_FILTER, NTAPS_CHROMA

    def taps_for(frac):
        if is_luma and alt_hpel and frac == 8:
            return ALT_HPEL_FILTER
        return taps_tbl[frac]
    int_x, frac_x = x + (mv_x >> frac_bits), mv_x & ((1 << frac_bits) - 1)
    int_y, frac_y = y + (mv_y >> frac_bits), mv_y & ((1 << frac_bits) - 1)
    half = ntaps // 2 - 1
    # gather padded source window (replicated borders)
    ph, pw = ref_plane.shape
    xs = np.clip(np.arange(int_x - half, int_x + w + ntaps - 1 - half), 0, pw - 1)
    ys = np.clip(np.arange(int_y - half, int_y + h + ntaps - 1 - half), 0, ph - 1)
    win = ref_plane[np.ix_(ys, xs)].astype(np.int32)
    last = not intermediate
    if frac_x == 0 and frac_y == 0:
        out = win[half:half + h, half:half + w]
        if intermediate:
            head_room = IF_INTERNAL_PREC - bit_depth
            out = (out.astype(np.int64) << head_room) - IF_INTERNAL_OFFS
        return out.astype(np.int32)
    if frac_y == 0:
        out = _filter_1d(win[half:half + h, :], taps_for(frac_x), 1,
                         True, last, bit_depth)
        return out.astype(np.int32)
    if frac_x == 0:
        out = _filter_1d(win[:, half:half + w], taps_for(frac_y), 0,
                         True, last, bit_depth)
        return out.astype(np.int32)
    tmp = _filter_1d(win, taps_for(frac_x), 1, True, False, bit_depth)
    out = _filter_1d(tmp, taps_for(frac_y), 0, False, last, bit_depth)
    return out.astype(np.int32)


def bi_average_np(a: np.ndarray, b: np.ndarray, bit_depth: int = 10) -> np.ndarray:
    """Bi-prediction average of two 14-bit intermediates
    (vvenc AreaBuf<Pel>::addAvg, Buffer.cpp:625)."""
    shift = max(2, IF_INTERNAL_PREC - bit_depth) + 1
    offset = (1 << (shift - 1)) + 2 * IF_INTERNAL_OFFS
    out = (a.astype(np.int64) + b.astype(np.int64) + offset) >> shift
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


def bcw_average_np(a: np.ndarray, b: np.ndarray, bcw_idx: int,
                   bit_depth: int = 10) -> np.ndarray:
    """BCW weighted bi-prediction average (vvenc
    AreaBuf<Pel>::addWeightedAvg, Buffer.cpp:522)."""
    w1 = BCW_WEIGHTS[bcw_idx]
    w0 = 8 - w1
    shift = max(2, IF_INTERNAL_PREC - bit_depth) + 3
    offset = (1 << (shift - 1)) + (IF_INTERNAL_OFFS << 3)
    out = (a.astype(np.int64) * w0 + b.astype(np.int64) * w1 + offset) \
        >> shift
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


# ---------------------------------------------------------------------------
# JAX batched path: one fractional phase, batch of windows
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("frac_x", "frac_y", "w", "h", "bit_depth",
                                   "is_luma"))
def mc_batch(windows: jax.Array, frac_x: int, frac_y: int, w: int, h: int,
             bit_depth: int = 10, is_luma: bool = True) -> jax.Array:
    """MC filter a batch of pre-gathered windows.

    windows: [B, h + ntaps - 1, w + ntaps - 1] int32 (for frac-only dims the
    extra ntaps-1 border is still expected; integer dims use the center).
    Returns [B, h, w] int32 predictions.
    """
    taps_tbl = LUMA_FILTER if is_luma else np.asarray(CHROMA_FILTER)
    ntaps = NTAPS_LUMA if is_luma else NTAPS_CHROMA
    half = ntaps // 2 - 1
    head_room = IF_INTERNAL_PREC - bit_depth
    maxval = (1 << bit_depth) - 1

    def stage(src, frac, axis, is_first, is_last):
        shift = IF_FILTER_PREC
        if is_last:
            shift += 0 if is_first else head_room
            offset = (1 << (shift - 1)) + \
                (0 if is_first else IF_INTERNAL_OFFS << IF_FILTER_PREC)
        else:
            shift -= head_room if is_first else 0
            offset = (-IF_INTERNAL_OFFS << shift) if is_first else 0
        taps = [int(t) for t in taps_tbl[frac]]
        length = src.shape[axis] - ntaps + 1
        acc = None
        for k in range(ntaps):
            sl = [slice(None)] * src.ndim
            sl[axis] = slice(k, k + length)
            term = taps[k] * src[tuple(sl)]
            acc = term if acc is None else acc + term
        val = (acc + offset) >> shift
        if is_last:
            val = jnp.clip(val, 0, maxval)
        return val

    if frac_x == 0 and frac_y == 0:
        return windows[:, half:half + h, half:half + w]
    if frac_y == 0:
        return stage(windows[:, half:half + h, :], frac_x, 2, True, True)
    if frac_x == 0:
        return stage(windows[:, :, half:half + w], frac_y, 1, True, True)
    tmp = stage(windows, frac_x, 2, True, False)
    return stage(tmp, frac_y, 1, False, True)
