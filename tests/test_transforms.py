"""Transform/quant tests: spec table reproduction, numpy-vs-JAX equivalence."""

import numpy as np
import pytest

from vvenc_tpu.ops import transforms as T


def test_dct2_known_small_matrices():
    # H.266 8.7.4.1: the canonical 4-point and 8-point DCT-2 rows
    t4 = T.dct2_matrix(4)
    assert t4.tolist() == [
        [64, 64, 64, 64],
        [83, 36, -36, -83],
        [64, -64, -64, 64],
        [36, -83, 83, -36]]
    t8 = T.dct2_matrix(8)
    assert t8[0].tolist() == [64] * 8
    assert t8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert t8[2].tolist() == [83, 36, -36, -83, -83, -36, 36, 83]
    assert t8[4].tolist() == [64, -64, -64, 64, 64, -64, -64, 64]


@pytest.mark.parametrize("n", [2, 4, 8, 16, 32, 64])
def test_dct2_near_orthogonal(n):
    t = T.dct2_matrix(n).astype(np.float64)
    g = t @ t.T
    scale = g[0, 0]
    off = g - np.diag(np.diag(g))
    # integer approximation: off-diagonal energy is tiny vs diagonal
    assert np.abs(off).max() < scale * 0.02
    # rows have nearly equal norms
    d = np.diag(g)
    assert d.max() / d.min() < 1.05


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32),
                                   (64, 64), (8, 4), (4, 16), (32, 8)])
def test_fwd_inv_roundtrip_np(shape):
    rng = np.random.RandomState(1)
    h, w = shape
    if max(h, w) > 32:
        # 64-point dims zero out the high-frequency half (normative), so
        # round-trip only holds for band-limited content
        yy, xx = np.mgrid[0:h, 0:w]
        resi = (300 * np.cos(np.pi * xx / w) * np.cos(np.pi * yy / h)
                + 100 * np.cos(3 * np.pi * xx / w)).astype(np.int32)
    else:
        resi = rng.randint(-512, 512, size=(h, w)).astype(np.int32)
    coeff = T.fwd_transform_np(resi, 10)
    if w > 32:
        assert not np.any(coeff[:, 32:])
    if h > 32:
        assert not np.any(coeff[32:, :])
    rec = T.inv_transform_np(coeff, 10)
    err = np.abs(rec - resi)
    assert err.mean() < 2.0 and err.max() <= 16


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32),
                                   (64, 64), (8, 4), (16, 8)])
def test_jax_matches_numpy(shape):
    rng = np.random.RandomState(3)
    h, w = shape
    resi = rng.randint(-512, 512, size=(5, h, w)).astype(np.int32)
    cj = np.asarray(T.fwd_transform_batch(resi, w, h, 10))
    for b in range(5):
        cn = T.fwd_transform_np(resi[b], 10)
        assert np.array_equal(cj[b], cn), (shape, "fwd")
    rj = np.asarray(T.inv_transform_batch(cj, w, h, 10))
    for b in range(5):
        rn = T.inv_transform_np(cj[b], 10)
        assert np.array_equal(rj[b], rn), (shape, "inv")


@pytest.mark.parametrize("qp", [22, 27, 32, 34, 37, 42, 51])
@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (8, 16)])
def test_quant_dequant_np(qp, shape):
    rng = np.random.RandomState(7)
    h, w = shape
    resi = rng.randint(-200, 200, size=(h, w)).astype(np.int32)
    coeff = T.fwd_transform_np(resi, 10)
    q = T.quant_np(coeff, qp, 10)
    d = T.dequant_np(q, qp, 10)
    # reconstruction error bounded by quant step
    tshift = T.transform_shift(w, h, 10) + (-1 if T.needs_sqrt2(w, h) else 0)
    step = (T.INV_QUANT_SCALES[1 if T.needs_sqrt2(w, h) else 0][qp % 6]
            << (qp // 6)) / (1 << (6 - tshift)) if 6 - tshift > 0 else 1
    assert np.abs(d - coeff).max() <= max(step, 1.0) * 1.01 + 1


@pytest.mark.parametrize("qp", [27, 34, 42])
def test_quant_dequant_jax_matches_np(qp):
    rng = np.random.RandomState(11)
    h = w = 16
    resi = rng.randint(-512, 512, size=(4, h, w)).astype(np.int32)
    coeff = np.asarray(T.fwd_transform_batch(resi, w, h, 10))
    qj = np.asarray(T.quant_batch(coeff, w, h, qp, 10))
    dj = np.asarray(T.dequant_batch(qj, w, h, qp, 10))
    for b in range(4):
        assert np.array_equal(qj[b], T.quant_np(coeff[b], qp, 10))
        assert np.array_equal(dj[b], T.dequant_np(qj[b], qp, 10))


def test_dct2_matches_float_dct():
    """Integer matrices track the real scaled DCT-II basis closely."""
    for n in (4, 8, 16, 32, 64):
        t = T.dct2_matrix(n).astype(np.float64)
        k = np.arange(n)[:, None]
        col = np.arange(n)[None, :]
        ref = np.cos(np.pi * k * (2 * col + 1) / (2 * n))
        ref[0] *= 1.0  # DC row unnormalized like the integer table
        scale = 64.0 * np.sqrt(n / 2) / np.sqrt(n / 2)  # 64 per row baseline
        approx = ref * 64.0 * np.sqrt(2.0) if n else ref
        # compare sign patterns of non-DC rows
        nz = np.abs(t[1:]) > 0
        assert np.all(np.sign(t[1:])[nz] == np.sign(ref[1:])[nz])
