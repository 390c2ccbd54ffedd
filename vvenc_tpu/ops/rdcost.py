"""Distortion kernels: SAD / SSE / SATD (Hadamard), numpy + batched JAX.

Analog of vvenc's RdCost engine (CommonLib/RdCost.h:114, SIMD kernels
RdCostX86.h) re-designed for TPU: costs are evaluated for a BATCH of
candidate blocks at once (e.g. all intra modes of a block, or all blocks of
a partition level) as dense tensor ops instead of per-block function calls.

SATD follows the reference's Hadamard convention (8x8 transform with the
final normalization (sum/8 * 2), 4x4 with sum/2-ish scaling) so RD decisions
are comparable to vvenc's; exact normalization: vvenc xCalcHADs8x8 returns
(sum + 2) >> 2 per 8x8 after abs-sum of the 2-D Hadamard, and xCalcHADs4x4
returns (sum + 1) >> 1 with DC adjusted.  We reproduce the 8x8 and 4x4
variants used for intra mode preselection.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _hadamard(n: int) -> np.ndarray:
    if n == 1:
        return np.array([[1]], dtype=np.int32)
    h = _hadamard(n // 2)
    return np.block([[h, h], [h, -h]])


def sse_np(a: np.ndarray, b: np.ndarray) -> int:
    d = a.astype(np.int64) - b.astype(np.int64)
    return int((d * d).sum())


def sad_np(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def satd_np(a: np.ndarray, b: np.ndarray) -> int:
    """Hadamard transformed SAD over 8x8 (or 4x4) tiles, vvenc convention."""
    d = a.astype(np.int64) - b.astype(np.int64)
    h, w = d.shape
    ts = 8 if (h % 8 == 0 and w % 8 == 0) else 4
    hm = _hadamard(ts).astype(np.int64)
    total = 0
    for y in range(0, h, ts):
        for x in range(0, w, ts):
            blk = d[y:y + ts, x:x + ts]
            t = hm @ blk @ hm
            s = int(np.abs(t).sum())
            if ts == 8:
                total += (s + 2) >> 2
            else:
                s = s - abs(int(t[0, 0])) + (abs(int(t[0, 0])) >> 2)
                total += (s + 1) >> 1
    return total


# ---------------------------------------------------------------------------
# JAX batched variants: inputs [B, H, W]
# ---------------------------------------------------------------------------

@jax.jit
def sse_batch(a: jax.Array, b: jax.Array) -> jax.Array:
    d = (a - b).astype(jnp.float32)
    return jnp.sum(d * d, axis=(-2, -1))


@jax.jit
def sad_batch(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(a - b), axis=(-2, -1))


@partial(jax.jit, static_argnames=("tile",))
def satd_batch(a: jax.Array, b: jax.Array, tile: int = 8) -> jax.Array:
    """Batched Hadamard SAD.  a, b: [B, H, W] with H, W multiples of tile."""
    d = (a - b).astype(jnp.int32)
    bsz, h, w = d.shape
    hm = jnp.asarray(_hadamard(tile), dtype=jnp.int32)
    # reshape into tiles: [B, h/t, t, w/t, t] -> [B, h/t, w/t, t, t]
    t = d.reshape(bsz, h // tile, tile, w // tile, tile).transpose(0, 1, 3, 2, 4)
    t = jnp.einsum("ij,bxyjk,kl->bxyil", hm, t, hm,
                   preferred_element_type=jnp.int32)
    s = jnp.sum(jnp.abs(t), axis=(-2, -1))
    if tile == 8:
        s = (s + 2) >> 2
    else:
        dc = jnp.abs(t[..., 0, 0])
        s = s - dc + (dc >> 2)
        s = (s + 1) >> 1
    return jnp.sum(s, axis=(1, 2))
