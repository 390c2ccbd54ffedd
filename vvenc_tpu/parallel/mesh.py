"""Mesh construction + sharded encoder search step.

The round-1 multi-chip program shards the CTU-block batch axis (spatial
tile columns / frame interleave) across a 1-D mesh and aggregates slice-level
rate/distortion totals with psum — the collective pattern that replaces
vvenc's shared-memory atomics (NoMallocThreadPool counters, SURVEY.md §2.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.intra_presel import predict_all_modes, satd_batch
from ..ops.transforms import (dequant_batch, fwd_transform_batch,
                              inv_transform_batch, quant_batch)


def make_mesh(devices=None, axis: str = "tiles") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, arr, axis_name: str = "tiles"):
    """Place a [B, ...] array sharded along the batch axis."""
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def search_step(src, tops, lefts, *, w, h, qp, bit_depth=10):
    """One partition-level RD trial for a batch of blocks — the device
    program of the batch-everything design (SURVEY.md §7): all candidate
    blocks of one size class run the full prediction -> cost -> residual
    -> reconstruction pipeline in one fused program.

    67-mode intra prediction (the production predict_all_modes stage) ->
    SATD mode decision -> DCT2 -> scalar quant (rate proxy) -> dequant ->
    inverse -> reconstruction + SSE.  Exact RDOQ/CABAC re-cost of the
    survivors stays on host (native driver) — this kernel is the device
    side of the trial loop.

    Returns (best_mode [B], levels [B, h, w], recon [B, h, w],
    bits_proxy [B], sse [B]).
    """
    maxval = (1 << bit_depth) - 1
    src = jnp.asarray(src)
    preds = predict_all_modes(jnp.asarray(tops), jnp.asarray(lefts), w, h,
                              bit_depth, B=src.shape[0])
    satds = satd_batch(src, preds, w, h)
    best = jnp.argmin(satds, axis=1)                       # [B]
    pred = jnp.take_along_axis(
        preds, best[:, None, None, None], axis=1)[:, 0].astype(jnp.int32)
    resi = src - pred
    coeff = fwd_transform_batch(resi, w, h, bit_depth)
    q = quant_batch(coeff, w, h, qp, bit_depth)
    bits_proxy = jnp.sum(jnp.abs(q), axis=(1, 2))
    d = dequant_batch(q, w, h, qp, bit_depth)
    rec = jnp.clip(pred + inv_transform_batch(d, w, h, bit_depth),
                   0, maxval)
    sse = jnp.sum((src - rec).astype(jnp.int64) ** 2, axis=(1, 2))
    return best, q, rec, bits_proxy, sse


def make_mesh2d(devices=None, shape=None,
                axes=("gops", "tiles")) -> Mesh:
    """2-D device mesh: GOP/frame parallelism (data axis) x tile columns
    (spatial axis) — the two sharding axes of SURVEY.md §2.5 (frame pool +
    tile columns)."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        g = 1
        for cand in (4, 2):
            if n % cand == 0 and n // cand > 1:
                g = cand
                break
        shape = (g, n // g)
    return Mesh(np.array(devices).reshape(shape), axes)


def sharded_encode_step2d(mesh: Mesh, *, w, h, qp, bit_depth=10):
    """Sharded encode step over a (gops, tiles) mesh with the two
    inter-chip communication patterns of the tiled/pipelined encoder:

    - ppermute along the tile axis: each tile column sends its right
      reconstruction-apron column to the neighbour (the reference-sample
      exchange at tile boundaries / IFP-style pipelining),
    - hierarchical psum: per-GOP rate over the tile axis (frame bit
      budgeting) and global rate over both axes (rate control).

    Inputs are [G, T, B, ...] with G sharded over 'gops' and T over
    'tiles'.  Built with shard_map so the collectives are explicit.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def local_step(src, rm, tops, lefts):
        # src: [Gl, Tl, B, h, w] local shard; rm kept for API compat
        del rm
        gl, tl, b = src.shape[0], src.shape[1], src.shape[2]

        def flat(x):
            return x.reshape((gl * tl * b,) + x.shape[3:])

        def unflat(x):
            return x.reshape((gl, tl, b) + x.shape[1:])
        best, q, rec, bits, sse = search_step(
            flat(src), flat(tops), flat(lefts), w=w, h=h, qp=qp,
            bit_depth=bit_depth)
        best, q, rec = unflat(best), unflat(q), unflat(rec)
        bits, sse = unflat(bits), unflat(sse)

        # tile-boundary apron: the RECONSTRUCTED right edge of each tile
        # column travels to the right neighbour, which redoes its first
        # block column with the received samples as the left reference
        # (the real tile/IFP dependency: reconstruction crossing a chip
        # boundary, SURVEY.md §2.5 tile-column sharding)
        apron = rec[..., -1]                       # [Gl, Tl, B, h]
        nt = jax.lax.psum(1, "tiles")
        perm = [(i, (i + 1) % nt) for i in range(nt)]
        nbr = jax.lax.ppermute(apron, "tiles", perm)
        # refine pass with the true left reference: rebuild the left
        # reference columns from the neighbour recon and re-run the
        # trial for every block of the column (blocks are a tile
        # column's CTU stack, so all of them border the seam)
        ref_col = flat(nbr)                        # [N, h]
        L = flat(lefts).shape[1]
        pad_len = L - (h + 1)
        lefts_new = jnp.concatenate(
            [ref_col[:, :1], ref_col,
             jnp.repeat(ref_col[:, -1:], pad_len, axis=1)], axis=1)[:, :L]
        best2, q2, rec2, bits2, sse2 = search_step(
            flat(src), flat(tops), lefts_new, w=w, h=h, qp=qp,
            bit_depth=bit_depth)
        # keep the better trial per block (lower SSE+rate proxy cost)
        better = (sse2 + bits2.astype(jnp.int64)
                  < flat(sse) + flat(bits).astype(jnp.int64))
        q = jnp.where(better[:, None, None], q2, flat(q)).reshape(
            gl, tl, b, h, w)
        rec = jnp.where(better[:, None, None], rec2, flat(rec)).reshape(
            gl, tl, b, h, w)
        best = jnp.where(better, best2, flat(best)).reshape(gl, tl, b)
        bits = jnp.where(better, bits2, flat(bits)).reshape(gl, tl, b)

        per_gop_bits = jax.lax.psum(jnp.sum(bits, axis=(1, 2)), "tiles")
        total_bits = jax.lax.psum(jnp.sum(bits), ("gops", "tiles"))
        return best, q, rec, per_gop_bits, total_bits

    gspec = P("gops", "tiles")
    return jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P("gops", "tiles"), P("gops", "tiles"),
                  P("gops", "tiles"), P("gops", "tiles")),
        out_specs=(gspec, gspec, gspec, P("gops"), P())))


_PLAN_JIT_CACHE: dict = {}


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def sharded_presel_costs(mesh: Mesh, blocks, tops, lefts, *, w, h,
                         bit_depth=10):
    """The PRODUCTION frame-level intra preselection kernel
    (ops/intra_presel.presel_costs) sharded across the device mesh.

    The block batch of one size class is split over every mesh axis
    (flattened); each device runs the identical 67-mode program on its
    shard, and the frame-total best-SATD statistic — the input to rate
    allocation — is psum-reduced across the whole mesh (the collective
    that replaces vvenc's shared-memory rate accumulation,
    EncGOP rcUpdateList ordering).

    Returns (costs [B, 67] replicated-gathered, total int32).  Results
    are bit-identical to the single-device kernel for any mesh shape
    (the chip-count-invariance property, SURVEY.md §4.5 analog).
    """
    import numpy as np
    from ..ops.intra_presel import presel_costs
    shard_map = _shard_map()
    axes = tuple(mesh.axis_names)
    n = int(np.prod([mesh.shape[a] for a in axes]))
    B = blocks.shape[0]
    pad = (-B) % n
    if pad:
        blocks = jnp.concatenate([blocks, jnp.zeros((pad,) + blocks.shape[1:],
                                                    blocks.dtype)])
        tops = jnp.concatenate([tops, jnp.zeros((pad,) + tops.shape[1:],
                                                tops.dtype)])
        lefts = jnp.concatenate([lefts, jnp.zeros((pad,) + lefts.shape[1:],
                                                  lefts.dtype)])

    key = (id(mesh), axes, w, h, bit_depth, "presel")
    fn = _PLAN_JIT_CACHE.get(key)
    if fn is None:
        def local(bl, tp, lf):
            costs = presel_costs(bl, tp, lf, w, h, bit_depth)
            total = jax.lax.psum(jnp.sum(jnp.min(costs, axis=1)), axes)
            return costs, total

        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes)),
            out_specs=(P(axes), P())))
        _PLAN_JIT_CACHE[key] = fn
    costs, total = fn(blocks, tops, lefts)
    return costs[:B], total


def sharded_plan_class(mesh: Mesh, blocks, tops, lefts, lmb, lms, *, w, h,
                       qp, bit_depth=10, implicit_mts=True, k=2):
    """The PRODUCTION device RD planning kernel (ops/intra_plan
    _plan_class_core) sharded across the device mesh: one size class's
    candidate-CU batch — spanning every frame of the prefill window —
    splits over all mesh axes (GOP/frame parallelism x tile columns,
    flattened), each device runs the identical predict/SATD/top-k/
    trial/cost program on its shard.  Per-block outputs are independent,
    so the result is bit-identical to the single-device kernel for any
    mesh shape (chip-count-invariant bitstreams; dryrun_multichip and
    tests/test_mesh.py assert the e2e property)."""
    import numpy as np
    from ..ops.intra_plan import _plan_class_core
    shard_map = _shard_map()
    axes = tuple(mesh.axis_names)
    n = int(np.prod([mesh.shape[a] for a in axes]))
    B = blocks.shape[0]
    pad = (-B) % n
    if pad:
        def padded(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        blocks, tops, lefts = padded(blocks), padded(tops), padded(lefts)
        lmb = jnp.concatenate([lmb, jnp.ones(pad, lmb.dtype)])
        lms = jnp.concatenate([lms, jnp.ones(pad, lms.dtype)])

    # jit cache keyed on (mesh, class params): a fresh closure per call
    # would RETRACE + RECOMPILE the sharded program every invocation —
    # the round-4 "8 devices slower than 1" was exactly this (the
    # single-device path amortizes its jit in ops/intra_plan)
    key = (id(mesh), axes, w, h, qp, bit_depth, implicit_mts, k)
    fn = _PLAN_JIT_CACHE.get(key)
    if fn is None:
        def local(bl, tp, lf, lm_, ls_):
            return _plan_class_core(bl, tp, lf, lm_, ls_, w, h, qp,
                                    bit_depth, implicit_mts, k)

        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(axes),) * 5, out_specs=(P(axes), P(axes))))
        _PLAN_JIT_CACHE[key] = fn
    modes, costs = fn(blocks, tops, lefts, lmb, lms)
    return modes[:B], costs[:B]


def sharded_search_step(mesh: Mesh, axis: str = "tiles", *, w, h, qp,
                        bit_depth=10):
    """Build a pjit-ed sharded trial step over `mesh`.

    Inputs sharded on the block axis; outputs: per-block decisions and
    reconstructions stay sharded, the rate total is psum-reduced across
    shards (the rate-control aggregation collective).
    """
    @partial(jax.jit,
             out_shardings=(NamedSharding(mesh, P(axis)),
                            NamedSharding(mesh, P(axis, None, None)),
                            NamedSharding(mesh, P(axis, None, None)),
                            NamedSharding(mesh, P())))
    def step(src, tops, lefts):
        best, q, rec, bits, sse = search_step(src, tops, lefts, w=w, h=h,
                                              qp=qp, bit_depth=bit_depth)
        total_bits = jnp.sum(bits)  # all-reduce across the sharded axis
        return best, q, rec, total_bits

    return step
