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
    from vvenc_tpu.ops.intra_batch import build_ref_mains
    rng = np.random.RandomState(seed)
    src = rng.randint(0, 1024, size=(batch, h, w)).astype(np.int32)
    tops = rng.randint(0, 1024, size=(batch, 2 * w + 3)).astype(np.int32)
    lefts = rng.randint(0, 1024, size=(batch, 2 * h + 3)).astype(np.int32)
    lefts[:, 0] = tops[:, 0]
    rm = build_ref_mains(tops, lefts, w, h)
    return src, rm, tops, lefts


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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_presel_matches_single_device():
    """The PRODUCTION preselection kernel sharded over the 2-D mesh is
    bit-identical to the single-device run (incl. a non-divisible batch)."""
    from vvenc_tpu.parallel.mesh import sharded_presel_costs
    from vvenc_tpu.ops.intra_presel import presel_costs
    mesh = make_mesh2d(jax.devices()[:8])
    rng = np.random.RandomState(3)
    for (w, h), batch in (((8, 8), 19), ((16, 8), 24)):
        src = rng.randint(0, 1024, (batch, h, w)).astype(np.int32)
        tops = rng.randint(0, 1024, (batch, 2 * w + 3)).astype(np.int32)
        lefts = rng.randint(0, 1024, (batch, 2 * h + 3)).astype(np.int32)
        costs, total = sharded_presel_costs(mesh, src, tops, lefts,
                                            w=w, h=h, bit_depth=10)
        ref = np.asarray(presel_costs(src, tops, lefts, w, h, 10))
        assert np.array_equal(np.asarray(costs), ref)
        assert int(total) == int(ref.min(axis=1).sum())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bitstream_chip_count_invariant(tmp_path):
    """Encoding with the frame-level device preselection sharded over an
    8-device mesh produces a byte-identical bitstream to the 1-device run
    (the WppBitEqual analog for chips, SURVEY.md §4.5)."""
    from vvenc_tpu.ops import intra_presel
    from vvenc_tpu.__main__ import main

    w, h, n = 64, 64, 2
    rng = np.random.RandomState(9)
    yuv = tmp_path / "clip.yuv"
    with open(yuv, "wb") as f:
        for i in range(n):
            y = np.clip(rng.randint(0, 255, (h, w)) // 2
                        + np.arange(w)[None, :] + 3 * i, 0,
                        255).astype(np.uint8)
            c = (y[::2, ::2] // 2 + 64).astype(np.uint8)
            f.write(y.tobytes())
            f.write(c.tobytes())
            f.write(c.tobytes())
    args = ["-i", str(yuv), "-s", f"{w}x{h}", "-q", "35", "-f", str(n),
            "--preset", "faster", "--intra-period", "1",
            "--set", "intra_presel=source"]
    out1, out8 = tmp_path / "one.266", tmp_path / "eight.266"
    assert intra_presel.MESH is None
    main(args + ["-o", str(out1)])
    intra_presel.MESH = make_mesh2d(jax.devices()[:8])
    try:
        main(args + ["-o", str(out8)])
    finally:
        intra_presel.MESH = None
    b1, b8 = out1.read_bytes(), out8.read_bytes()
    assert len(b1) > 0 and b1 == b8
