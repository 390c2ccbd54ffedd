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
    rng = np.random.RandomState(seed)
    src = rng.randint(0, 1024, size=(batch, h, w)).astype(np.int32)
    tops = rng.randint(0, 1024, size=(batch, 2 * w + 3)).astype(np.int32)
    lefts = rng.randint(0, 1024, size=(batch, 2 * h + 3)).astype(np.int32)
    lefts[:, 0] = tops[:, 0]
    return src, tops, lefts


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_1d_matches_single_device():
    w = h = 16
    src, tops, lefts = _inputs(8, w, h, seed=1)
    ref = search_step(src, tops, lefts, w=w, h=h, qp=40)
    mesh = make_mesh(jax.devices()[:8])
    step = sharded_search_step(mesh, w=w, h=h, qp=40)
    out = step(shard_batch(mesh, src), shard_batch(mesh, tops),
               shard_batch(mesh, lefts))
    assert np.array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    assert np.array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    assert np.array_equal(np.asarray(out[2]), np.asarray(ref[2]))
    assert int(out[3]) == int(np.asarray(ref[3]).sum())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_2d_gops_x_tiles():
    """The 2-D (gops x tiles) trial step: each tile column runs the full
    predict->SATD->transform->quant->recon trial, ppermutes its RECON
    right-edge apron to the neighbour, and re-trials with the received
    samples as the left reference — validated against an exact host
    replay of the same two-stage dataflow."""
    w = h = 16
    mesh = make_mesh2d(jax.devices()[:8])
    g_ax, t_ax = mesh.devices.shape
    assert g_ax * t_ax == 8
    gg, tt, b = 2 * g_ax, t_ax, 2
    src, tops, lefts = _inputs(gg * tt * b, w, h, seed=2)

    def reshard(x):
        x = x.reshape((gg, tt, b) + x.shape[1:])
        return jax.device_put(x, NamedSharding(mesh, P("gops", "tiles")))
    step = sharded_encode_step2d(mesh, w=w, h=h, qp=40)
    best, q, rec, per_gop, total = step(reshard(src), reshard(src),
                                        reshard(tops), reshard(lefts))
    assert best.shape == (gg, tt, b)
    assert q.shape == (gg, tt, b, h, w)
    assert rec.shape == (gg, tt, b, h, w)
    assert per_gop.shape == (gg,)

    # host replay of the two-stage dataflow (stage 1 unsharded trial,
    # recon-apron exchange along the DEVICE tile axis, stage 2 refine)
    b1, q1, r1, bits1, sse1 = (np.asarray(a) for a in search_step(
        src, tops, lefts, w=w, h=h, qp=40))
    r1r = r1.reshape(gg, tt, b, h, w)
    nbr = np.roll(r1r[..., -1], 1, axis=1)        # [gg, tt, b, h]
    L = lefts.shape[1]
    ref_col = nbr.reshape(-1, h)
    pad_len = L - (h + 1)
    lefts2 = np.concatenate(
        [ref_col[:, :1], ref_col,
         np.repeat(ref_col[:, -1:], pad_len, axis=1)], axis=1)[:, :L]
    b2, q2, r2, bits2, sse2 = (np.asarray(a) for a in search_step(
        src, tops, lefts2.astype(np.int32), w=w, h=h, qp=40))
    better = (sse2 + bits2.astype(np.int64)
              < sse1 + bits1.astype(np.int64))
    exp_best = np.where(better, b2, b1).reshape(gg, tt, b)
    exp_bits = np.where(better, bits2, bits1).reshape(gg, tt, b)
    exp_rec = np.where(better[:, None, None], r2, r1).reshape(
        gg, tt, b, h, w)
    assert np.array_equal(np.asarray(best), exp_best)
    assert np.array_equal(np.asarray(rec), exp_rec)
    assert int(total) == int(exp_bits.sum())
    assert np.array_equal(np.asarray(per_gop),
                          exp_bits.sum(axis=(1, 2)))


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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bitstream_chip_count_invariant_ra_tiles(tmp_path):
    """Chip-count invariance on a RANDOM-ACCESS clip with TILE columns:
    the sharded device preselection (used by the intra pictures and the
    intra CUs of inter pictures) produces a byte-identical bitstream for
    1 vs 8 devices (SURVEY.md §2.5 tile-column sharding row)."""
    from vvenc_tpu.ops import intra_presel
    from vvenc_tpu.__main__ import main

    w, h, n = 128, 64, 5
    rng = np.random.RandomState(4)
    yuv = tmp_path / "clip.yuv"
    with open(yuv, "wb") as f:
        for i in range(n):
            y = np.clip(rng.randint(0, 40, (h, w)) + 100
                        + np.arange(w)[None, :] // 2 + 5 * i, 0,
                        255).astype(np.uint8)
            c = (y[::2, ::2] // 2 + 64).astype(np.uint8)
            f.write(y.tobytes())
            f.write(c.tobytes())
            f.write(c.tobytes())
    args = ["-i", str(yuv), "-s", f"{w}x{h}", "-q", "35", "-f", str(n),
            "--preset", "faster", "--intra-period", "0",
            "--gop-size", "4",
            "--set", "intra_presel=source",
            "--set", "num_tile_cols=2", "--set", "mctf=0"]
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
    from vvenc_tpu.decoder.decoder import decode_stream
    assert len(decode_stream(b1)) == n
