"""MC interpolation + motion estimation kernel tests."""

import numpy as np
import pytest

from vvenc_tpu.ops import interp as IP
from vvenc_tpu.ops import me as ME


def _plane(rng, h, w):
    return rng.randint(0, 1024, size=(h, w)).astype(np.int32)


def test_mc_integer_mv_is_copy():
    rng = np.random.RandomState(0)
    p = _plane(rng, 64, 64)
    out = IP.mc_block_np(p, 16, 16, 8, 8, 4 << 4, (-2) << 4)
    assert np.array_equal(out, p[14:22, 20:28])


def test_mc_filter_tables_sane():
    assert IP.LUMA_FILTER.shape == (16, 8)
    assert np.all(IP.LUMA_FILTER.sum(axis=1) == 64)
    # half-pel phase symmetric
    assert np.array_equal(IP.LUMA_FILTER[8], IP.LUMA_FILTER[8][::-1])


@pytest.mark.parametrize("frac", [(8, 0), (0, 8), (8, 8), (4, 12), (1, 15)])
def test_mc_np_vs_jax(frac):
    rng = np.random.RandomState(3)
    p = _plane(rng, 48, 48)
    fx, fy = frac
    w = h = 8
    x, y = 16, 12
    ref = IP.mc_block_np(p, x, y, w, h, fx, fy)
    # pre-gather the window like the batch kernel expects
    half = 3
    win = p[y - half:y + h + 4, x - half:x + w + 4].astype(np.int32)
    out = np.asarray(IP.mc_batch(win[None], fx, fy, w, h))[0]
    assert np.array_equal(out, ref), (frac,)


def test_mc_halfpel_value():
    # flat plane: any interpolation returns the same value
    p = np.full((32, 32), 600, dtype=np.int32)
    out = IP.mc_block_np(p, 8, 8, 4, 4, 8, 8)
    assert np.all(out == 600)


def test_mc_chroma_phases():
    rng = np.random.RandomState(9)
    p = _plane(rng, 32, 32)
    out = IP.mc_block_np(p, 8, 8, 4, 4, 16, 7, is_luma=False)
    assert out.shape == (4, 4)
    assert out.min() >= 0 and out.max() <= 1023


def test_full_search_finds_true_shift():
    rng = np.random.RandomState(5)
    h = w = 16
    R = 8
    area = _plane(rng, h + 2 * R, w + 2 * R)
    # carve the block from a known displacement
    dy, dx = 3, 11
    block = area[dy:dy + h, dx:dx + w].copy()
    costs = ME.full_search_sse_np(block, area)
    assert costs[dy, dx] == 0
    j = np.unravel_index(np.argmin(costs), costs.shape)
    assert j == (dy, dx)
    # batch kernel agrees
    cj = np.asarray(ME.full_search_sse_batch(block[None], area[None], h, w))
    assert np.allclose(cj[0], costs)
    my, mx, c = ME.best_mv_batch(block[None], area[None], h, w)
    assert (int(my[0]), int(mx[0])) == (dy, dx)
    assert float(c[0]) == 0.0


def test_full_search_batch_multiple():
    rng = np.random.RandomState(8)
    h = w = 8
    R = 4
    B = 5
    areas = np.stack([_plane(rng, h + 2*R, w + 2*R) for _ in range(B)])
    shifts = [(rng.randint(0, 2*R+1), rng.randint(0, 2*R+1)) for _ in range(B)]
    blocks = np.stack([areas[b, dy:dy+h, dx:dx+w] for b, (dy, dx) in
                       enumerate(shifts)])
    my, mx, c = ME.best_mv_batch(blocks, areas, h, w)
    for b, (dy, dx) in enumerate(shifts):
        # f32 accumulation-order rounding leaves a tiny residue; any wrong
        # displacement costs millions, so the argmin is unaffected
        assert float(c[b]) < 100.0
        assert (int(my[b]), int(mx[b])) == (dy, dx)
