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
