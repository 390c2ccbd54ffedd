"""Batched intra mode evaluation for TPU (the encoder's hot search kernel).

TPU-first inversion of vvenc's per-block mode loop (IntraSearch
estIntraPredLumaQT, IntraSearch.cpp): instead of predicting one mode of one
block at a time, evaluate ALL 67 modes of a BATCH of equal-size blocks as
one dense program:

  host:   per block, build the per-mode extended main reference array
          (availability, substitution, MDIS filtering, wide-angle mapping,
          negative-angle extension) -> RM [B, M, L]
  device: predictions [B, M, H, W] via 4 shifted gathers + filter FMA,
          planar/DC closed-form, then SATD against the source -> costs [B, M]

All index/filter tables are static per (W, H) so XLA compiles one program
per block size.  PDPC is omitted in the preselection pass (full RD of the
chosen candidates applies it exactly, matching vvenc's pre-pass approach).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from . import intra as I
from .rdcost import _hadamard

NUM_MODES = I.NUM_LUMA_MODE  # 67


@lru_cache(maxsize=None)
def _mode_tables(w: int, h: int):
    """Static per-(w, h) tables for the angular gather kernel.

    Returns (ref_len, base_off, row_start[M, H] int32, filt[M, H, 4] int32,
             is_transposed[M] bool, uses_filtered[M] bool).
    row_start[m, y] gives the index into the (per-mode) extended main ref of
    the first tap for row y; prediction x adds +x.
    """
    assert w == h, "non-square handled after MTT lands"
    side = h
    base_off = side              # room for negative-angle left extension
    ref_len = side + 2 * w + 8   # base_off + refMain[0..2w+4]
    row_start = np.zeros((NUM_MODES, h), dtype=np.int32)
    filt = np.zeros((NUM_MODES, h, 4), dtype=np.int32)
    transposed = np.zeros(NUM_MODES, dtype=bool)
    uses_filtered = np.zeros(NUM_MODES, dtype=bool)
    for mode in range(2, NUM_MODES):
        p = I.intra_params(w, h, mode, True)
        transposed[mode] = not p.is_ver
        uses_filtered[mode] = p.ref_filter
        delta_pos = p.angle
        for y in range(h):
            delta_int = delta_pos >> 5
            frac = delta_pos & 31
            if I.is_integer_slope(abs(p.angle)):
                # pure copy: the unit tap sits at k=1, so the same base as
                # the 4-tap case addresses refMain[deltaInt + 1 + x]
                row_start[mode, y] = base_off + delta_int
                filt[mode, y] = (0, 64, 0, 0)
            else:
                row_start[mode, y] = base_off + delta_int
                if p.interp:
                    filt[mode, y] = I.smoothing_filter(frac)
                else:
                    filt[mode, y] = I.CHROMA_FILTER[frac]
            delta_pos += p.angle
    return ref_len, base_off, row_start, filt, transposed, uses_filtered


def build_ref_mains(tops: np.ndarray, lefts: np.ndarray, w: int, h: int):
    """Host prep: per-mode extended main reference arrays.

    tops:  [B, 2w+3] unfiltered top refs (corner at index 0)
    lefts: [B, 2h+3]
    Returns RM [B, NUM_MODES, ref_len] int32 plus (tops, lefts) passthrough.
    """
    B = tops.shape[0]
    ref_len, base_off, _, _, transposed, uses_filtered = _mode_tables(w, h)
    ftops = np.empty_like(tops)
    flefts = np.empty_like(lefts)
    for b in range(B):
        ftops[b], flefts[b] = I.filter_reference(tops[b], lefts[b])
    rm = np.zeros((B, NUM_MODES, ref_len), dtype=np.int32)
    for mode in range(2, NUM_MODES):
        p = I.intra_params(w, h, mode, True)
        t_src = ftops if p.ref_filter else tops
        l_src = flefts if p.ref_filter else lefts
        for b in range(B):
            main, _, base = I._build_ref_main_side(
                t_src[b], l_src[b], p, w, h)
            n = min(len(main), ref_len - (base_off - base))
            rm[b, mode, base_off - base: base_off - base + n] = main[:n]
    return rm


@partial(jax.jit, static_argnames=("w", "h", "bit_depth"))
def mode_costs_batch(src: jax.Array, rm: jax.Array, tops: jax.Array,
                     lefts: jax.Array, w: int, h: int,
                     bit_depth: int = 10) -> jax.Array:
    """SATD cost of every intra mode for a batch of blocks.

    src: [B, H, W] int32 source samples (internal bit depth)
    rm:  [B, M, L] per-mode extended main refs (host-built)
    tops/lefts: [B, 2w+3] / [B, 2h+3] raw refs for planar/DC
    returns costs [B, M] int32 (SATD, no PDPC, no mode-bit term)
    """
    ref_len, base_off, row_start, filt, transposed, _ = _mode_tables(w, h)
    row_start_j = jnp.asarray(row_start)            # [M, H]
    filt_j = jnp.asarray(filt)                      # [M, H, 4]
    x_idx = jnp.arange(w, dtype=jnp.int32)
    # angular: idx[m, y, x] = row_start[m, y] + x ; gather 4 taps
    idx = row_start_j[:, :, None] + x_idx[None, None, :]      # [M, H, W]
    bsz = rm.shape[0]
    flat_idx = idx.reshape(NUM_MODES, h * w)
    acc = None
    for k in range(4):
        gidx = jnp.broadcast_to((flat_idx + k)[None], (bsz, NUM_MODES, h * w))
        g = jnp.take_along_axis(rm, gidx, axis=2) \
               .reshape(bsz, NUM_MODES, h, w)
        term = filt_j[None, :, :, k:k + 1] * g
        acc = term if acc is None else acc + term
    ang = (acc + 32) >> 6
    maxval = (1 << bit_depth) - 1
    ang = jnp.clip(ang, 0, maxval)
    # transpose horizontal-family modes
    tr = jnp.asarray(transposed)
    ang = jnp.where(tr[None, :, None, None], ang.swapaxes(2, 3), ang)

    # planar
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    top_row = tops[:, 1:w + 2]        # [B, w+1]
    left_col = lefts[:, 1:h + 2]      # [B, h+1]
    br_ = left_col[:, h][:, None, None]
    tr_ = top_row[:, w][:, None, None]
    xg = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    yg = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    hor = (left_col[:, :h, None] << log2w) + (xg + 1) * (tr_ - left_col[:, :h, None])
    ver = (top_row[:, None, :w] << log2h) + (yg + 1) * (br_ - top_row[:, None, :w])
    planar = ((hor << log2h) + (ver << log2w) + (1 << (log2w + log2h))) \
        >> (1 + log2w + log2h)
    # DC (square blocks: average of both borders)
    dc = (jnp.sum(tops[:, 1:w + 1], axis=1) + jnp.sum(lefts[:, 1:h + 1], axis=1)
          + w) >> (log2w + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (src.shape[0], h, w))

    preds = ang.at[:, I.PLANAR_IDX].set(planar)
    preds = preds.at[:, I.DC_IDX].set(dcp)

    # SATD over 8x8 (or 4x4) tiles
    tile = 8 if (w % 8 == 0 and h % 8 == 0) else 4
    hm = jnp.asarray(_hadamard(tile), dtype=jnp.int32)
    d = src[:, None, :, :] - preds                                  # [B,M,H,W]
    t = d.reshape(d.shape[0], NUM_MODES, h // tile, tile, w // tile, tile) \
         .transpose(0, 1, 2, 4, 3, 5)
    t = jnp.matmul(hm[None, None, None, None], t,
                   preferred_element_type=jnp.int32)
    t = jnp.matmul(t, hm[None, None, None, None],
                   preferred_element_type=jnp.int32)
    s = jnp.sum(jnp.abs(t), axis=(-2, -1))
    if tile == 8:
        s = (s + 2) >> 2
    else:
        dc_t = jnp.abs(t[..., 0, 0])
        s = ((s - dc_t + (dc_t >> 2)) + 1) >> 1
    return jnp.sum(s, axis=(2, 3))                                  # [B, M]
