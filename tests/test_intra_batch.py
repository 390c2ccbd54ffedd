"""Batched TPU intra search kernel vs scalar golden model."""

import numpy as np
import pytest

from vvenc_tpu.ops import intra as I
from vvenc_tpu.ops import intra_batch as IB
from vvenc_tpu.ops import rdcost as R


def _random_refs(rng, w, h, n):
    tops = rng.randint(0, 1024, size=(n, 2 * w + 3)).astype(np.int32)
    lefts = rng.randint(0, 1024, size=(n, 2 * h + 3)).astype(np.int32)
    # corner must agree between top[0] and left[0]
    lefts[:, 0] = tops[:, 0]
    return tops, lefts


@pytest.mark.parametrize("size", [8, 16, 32])
def test_batched_angular_matches_scalar(size):
    rng = np.random.RandomState(3)
    w = h = size
    B = 4
    tops, lefts = _random_refs(rng, w, h, B)
    src = rng.randint(0, 1024, size=(B, h, w)).astype(np.int32)
    rm = IB.build_ref_mains(tops, lefts, w, h)
    costs = np.asarray(IB.mode_costs_batch(src, rm, tops, lefts, w, h))
    assert costs.shape == (B, IB.NUM_MODES)
    # verify a sample of modes against the scalar model without PDPC
    for b in range(B):
        for mode in [0, 1, 2, 10, 18, 26, 34, 40, 50, 60, 66]:
            pred = I.predict_intra(tops[b], lefts[b], mode, w, h, 10, True,
                                   override_pdpc=False)
            want = R.satd_np(src[b], pred)
            got = int(costs[b, mode])
            # planar with ref-filter enabled differs (preselection skips the
            # planar MDIS filter); allow only that divergence
            if mode == 0 and w * h > 32:
                pred_nf = I.predict_intra(tops[b], lefts[b], mode, w, h, 10,
                                          True, override_pdpc=False)
                continue
            assert got == want, (b, mode, got, want)


def test_batched_planar_dc_4x4_8x8():
    rng = np.random.RandomState(9)
    for size in (8, 16):
        w = h = size
        tops, lefts = _random_refs(rng, w, h, 3)
        src = rng.randint(0, 1024, size=(3, h, w)).astype(np.int32)
        rm = IB.build_ref_mains(tops, lefts, w, h)
        costs = np.asarray(IB.mode_costs_batch(src, rm, tops, lefts, w, h))
        for b in range(3):
            dc_pred = I.predict_intra(tops[b], lefts[b], I.DC_IDX, w, h, 10,
                                      True, override_pdpc=False)
            assert int(costs[b, I.DC_IDX]) == R.satd_np(src[b], dc_pred)


def test_batched_best_mode_reasonable():
    """For a directional gradient the best mode should be directional."""
    rng = np.random.RandomState(5)
    w = h = 16
    yy, xx = np.mgrid[0:h, 0:w]
    src = ((xx * 20) % 1024).astype(np.int32)[None]  # vertical stripes
    top = np.concatenate([[0], (np.arange(2 * w + 2) * 20) % 1024]).astype(np.int32)
    left = np.zeros(2 * h + 3, dtype=np.int32)
    rm = IB.build_ref_mains(top[None], left[None], w, h)
    costs = np.asarray(IB.mode_costs_batch(src, rm, top[None], left[None], w, h))
    best = int(np.argmin(costs[0]))
    assert abs(best - I.VER_IDX) <= 2, best  # near-vertical wins


def test_mip_prediction_properties():
    """MIP predictions stay in range and vary with mode/transpose."""
    import numpy as np
    from vvenc_tpu.ops import mip as M
    rng = np.random.RandomState(11)
    for (w, h) in ((4, 4), (8, 8), (4, 16), (16, 4), (16, 16), (32, 32)):
        top = rng.randint(0, 1024, w * 2 + 3).astype(np.int32)
        left = rng.randint(0, 1024, h * 2 + 3).astype(np.int32)
        n = M.num_mip_modes(w, h)
        preds = {(m, t): M.predict_mip(top[:w], left[:h], w, h, m, bool(t), 10)
                 for m in range(n) for t in (0, 1)}
        for p in preds.values():
            assert p.shape == (h, w)
            assert 0 <= p.min() and p.max() <= 1023
        assert len({p.tobytes() for p in preds.values()}) > n // 2
