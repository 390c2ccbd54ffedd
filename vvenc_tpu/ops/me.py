"""Motion estimation kernels — TPU-first full-search over displacement grids.

TPU-first inversion of vvenc's TZ search (InterSearch::xTZSearch,
InterSearch.h:506): instead of a sequential pattern search with early
termination, evaluate a dense displacement grid for a BATCH of blocks in one
program.  SSE costs decompose as sum(a^2) + sum(b^2) - 2*corr(a, b) where
the cross-correlation maps onto XLA convolution (MXU) and the window sums
are box filters — all dense tensor work.

The encoder uses: integer full-search (this module) -> fractional
refinement via the 16-phase interpolation sweep (ops/interp.py) -> exact RD
of the best candidates on host.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def full_search_sse_np(block: np.ndarray, area: np.ndarray) -> np.ndarray:
    """Reference: SSE of `block` [h, w] at every displacement inside
    `area` [h + 2R, w + 2R] -> costs [(2R+1), (2R+1)]."""
    h, w = block.shape
    ah, aw = area.shape
    out = np.zeros((ah - h + 1, aw - w + 1), dtype=np.int64)
    for dy in range(ah - h + 1):
        for dx in range(aw - w + 1):
            d = area[dy:dy + h, dx:dx + w].astype(np.int64) - block
            out[dy, dx] = (d * d).sum()
    return out


@partial(jax.jit, static_argnames=("h", "w"))
def full_search_sse_batch(blocks: jax.Array, areas: jax.Array,
                          h: int, w: int) -> jax.Array:
    """SSE over all integer displacements for a batch of blocks.

    blocks: [B, h, w] int32; areas: [B, h+2R, w+2R] int32
    returns costs [B, 2R+1, 2R+1] float32 (exact for 10-bit inputs within
    f32 at small block sizes; i32 path kept for the box sums).
    """
    bf = blocks.astype(jnp.float32)
    af = areas.astype(jnp.float32)
    # cross-correlation via conv: treat block as the kernel
    # batch_group_count groups the batch against the B filters: the result
    # lands as [1, B, gh, gw] with channel b = block b over area b
    corr = jax.lax.conv_general_dilated(
        af[:, None, :, :], bf[:, None, :, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=1,
        batch_group_count=blocks.shape[0],
        preferred_element_type=jnp.float32)[0]
    ones = jnp.ones((1, 1, h, w), dtype=jnp.float32)
    b2 = jax.lax.conv_general_dilated(
        (af * af)[:, None, :, :], ones, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)[:, 0]
    a2 = jnp.sum(bf * bf, axis=(1, 2))[:, None, None]
    return a2 + b2 - 2.0 * corr


def best_mv_batch(blocks, areas, h, w, lambda_mv=0.0, center_bias=None):
    """Argmin over the displacement grid -> integer MVs relative to the
    window top-left.  Returns (mv_y [B], mv_x [B], cost [B])."""
    costs = full_search_sse_batch(blocks, areas, h, w)
    bsz, gh, gw = costs.shape
    flat = costs.reshape(bsz, -1)
    idx = jnp.argmin(flat, axis=1)
    return idx // gw, idx % gw, jnp.take_along_axis(flat, idx[:, None],
                                                   axis=1)[:, 0]


# ---------------------------------------------------------------------------
# frame-level hierarchical pre-ME (the production integration): one device
# program per (frame, reference) computes the best integer MV per 16x16
# block — quarter-res full-range search + full-res refine — and the host
# RD loop uses it as its search center (replacing the numpy coarse stage
# of _motion_search; reference anchor InterSearch::xTZSearch,
# InterSearch.h:506)
# ---------------------------------------------------------------------------

ME_BS = 16      # pre-ME block size (luma)
ME_PAD = 96     # plane padding (>= R + bs)


@partial(jax.jit, static_argnames=("W", "H", "R"))
def frame_me(src_pad: jax.Array, ref_pad: jax.Array, W: int, H: int,
             R: int = 64):
    """Best integer MV per 16x16 block of the frame vs one reference.

    src_pad/ref_pad: [H + 2*ME_PAD, W + 2*ME_PAD] int16 edge-padded
    planes.  Two stages: (1) quarter-resolution SSE over the full +-R
    range, (2) full-resolution +-3 refine around the coarse winner.
    Returns (mv [ny*nx, 2] int32 full-pel (x, y), cost [ny*nx] f32)."""
    bs = ME_BS
    P = ME_PAD
    ny, nx = H // bs, W // bs
    B = ny * nx
    Wp = W + 2 * P

    # ---- quarter-res stage ----
    q = 4
    Rq = R // q
    bq = bs // q
    core = src_pad[P:P + ny * bs, P:P + nx * bs].astype(jnp.float32)
    src_ds = core.reshape(ny * bs // q, q, nx * bs // q, q) \
        .mean(axis=(1, 3))                                   # [H/4, W/4]
    rp = ref_pad.astype(jnp.float32)
    ref_ds = rp.reshape((H + 2 * P) // q, q, Wp // q, q).mean(axis=(1, 3))
    Wq = Wp // q
    Pq = P // q
    blocks_ds = src_ds.reshape(ny, bq, nx, bq).transpose(0, 2, 1, 3) \
        .reshape(B, bq, bq)
    # window gather: [B, 2Rq+bq, 2Rq+bq]
    by = (jnp.arange(ny, dtype=jnp.int32) * bq)[:, None]
    bx = (jnp.arange(nx, dtype=jnp.int32) * bq)[None, :]
    base = ((by + Pq - Rq) * Wq + bx + Pq - Rq).reshape(-1)   # [B]
    span = 2 * Rq + bq
    iy = jnp.arange(span, dtype=jnp.int32)[:, None] * Wq
    ix = jnp.arange(span, dtype=jnp.int32)[None, :]
    wins = jnp.take(ref_ds.reshape(-1),
                    base[:, None, None] + iy[None] + ix[None])  # [B,s,s]
    # SSE over displacements via sliding diffs
    dy = jnp.arange(2 * Rq + 1)
    dd = (wins[:, :, None, :, None] if False else None)  # placeholder
    # windows per displacement: build [B, (2Rq+1)^2, bq, bq] via gather
    oy = jnp.arange(2 * Rq + 1, dtype=jnp.int32)
    ox = jnp.arange(2 * Rq + 1, dtype=jnp.int32)
    off = (oy[:, None] * span + ox[None, :]).reshape(-1)      # [D]
    blk_iy = jnp.arange(bq, dtype=jnp.int32)[:, None] * span
    blk_ix = jnp.arange(bq, dtype=jnp.int32)[None, :]
    gidx = off[:, None, None] + blk_iy[None] + blk_ix[None]   # [D,bq,bq]
    cand = jnp.take(wins.reshape(B, -1), gidx.reshape(-1),
                    axis=1).reshape(B, -1, bq, bq)
    diff = cand - blocks_ds[:, None]
    cost_ds = jnp.sum(diff * diff, axis=(2, 3))               # [B, D]
    bi = jnp.argmin(cost_ds, axis=1).astype(jnp.int32)
    cy = bi // (2 * Rq + 1) - Rq
    cx = bi % (2 * Rq + 1) - Rq

    # ---- full-res refine +-3 around (4*cx, 4*cy) ----
    r2 = 3
    blocks = core.reshape(ny, bs, nx, bs).transpose(0, 2, 1, 3) \
        .reshape(B, bs, bs)
    fy = (jnp.arange(ny, dtype=jnp.int32) * bs)[:, None] \
        .repeat(nx, 1).reshape(-1)
    fx = (jnp.arange(nx, dtype=jnp.int32) * bs)[None, :] \
        .repeat(ny, 0).reshape(-1)
    base2 = ((fy + P + 4 * cy - r2) * Wp + fx + P + 4 * cx - r2)  # [B]
    span2 = 2 * r2 + bs
    wy = jnp.arange(span2, dtype=jnp.int32)[:, None] * Wp
    wx = jnp.arange(span2, dtype=jnp.int32)[None, :]
    wins2 = jnp.take(rp.reshape(-1),
                     base2[:, None, None] + wy[None] + wx[None])
    oy2 = jnp.arange(2 * r2 + 1, dtype=jnp.int32)
    off2 = (oy2[:, None] * span2 + oy2[None, :]).reshape(-1)
    b_iy = jnp.arange(bs, dtype=jnp.int32)[:, None] * span2
    b_ix = jnp.arange(bs, dtype=jnp.int32)[None, :]
    gidx2 = off2[:, None, None] + b_iy[None] + b_ix[None]
    cand2 = jnp.take(wins2.reshape(B, -1), gidx2.reshape(-1),
                     axis=1).reshape(B, -1, bs, bs)
    diff2 = cand2 - blocks[:, None]
    cost2 = jnp.sum(diff2 * diff2, axis=(2, 3))               # [B, D2]
    bi2 = jnp.argmin(cost2, axis=1).astype(jnp.int32)
    ry = bi2 // (2 * r2 + 1) - r2
    rx = bi2 % (2 * r2 + 1) - r2
    mv = jnp.stack([4 * cx + rx, 4 * cy + ry], axis=1)
    best = jnp.take_along_axis(cost2, bi2[:, None], 1)[:, 0]
    return mv, best


class FrameMe:
    """Per-(picture, reference) device pre-ME table.

    lookup(x, y) -> (mv_x, mv_y) full-pel best for the 16x16 block
    containing (x, y)."""

    def __init__(self, src_y: np.ndarray, ref_y: np.ndarray, R: int = 64):
        from ..utils.devclock import DEV
        H, W = src_y.shape
        self.bs = ME_BS
        Hc, Wc = (H // self.bs) * self.bs, (W // self.bs) * self.bs
        with DEV.section():
            sp = np.pad(src_y, ME_PAD, mode="edge").astype(np.int16)
            rp = np.pad(ref_y, ME_PAD, mode="edge").astype(np.int16)
            # pad to the block multiple INSIDE the padded plane view
            mv, cost = frame_me(jnp.asarray(sp[:Hc + 2 * ME_PAD,
                                               :Wc + 2 * ME_PAD]),
                                jnp.asarray(rp[:Hc + 2 * ME_PAD,
                                               :Wc + 2 * ME_PAD]),
                                Wc, Hc, R)
            self.mv = np.asarray(mv).reshape(Hc // self.bs,
                                             Wc // self.bs, 2)

    def lookup(self, x: int, y: int):
        iy = min(max(y // self.bs, 0), self.mv.shape[0] - 1)
        ix = min(max(x // self.bs, 0), self.mv.shape[1] - 1)
        return int(self.mv[iy, ix, 0]), int(self.mv[iy, ix, 1])
