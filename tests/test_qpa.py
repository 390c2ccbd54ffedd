"""QPA (perceptual QP adaptation): unit tests for the XPSNR visual-activity
model + encode/decode round trip with cu_qp_delta emission."""

import numpy as np

from vvenc_tpu.encoder import IntraEncoder, EncoderConfig
from vvenc_tpu.encoder.qpa import (apply_qpa_slice, appr_i3_log2,
                                   average_picture_activity)
from vvenc_tpu.decoder import decode_stream


def _planes(w, h, seed=3, flat_region=True):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 1024, (h, w)).astype(np.int32)
    if flat_region:
        y[:h // 2, :w // 2] = 512  # flat quadrant -> lower activity
    u = rng.randint(300, 700, (h // 2, w // 2)).astype(np.int32)
    v = rng.randint(300, 700, (h // 2, w // 2)).astype(np.int32)
    return {0: y, 1: u, 2: v}


def test_appr_i3_log2():
    assert appr_i3_log2(1.0) == 0
    assert appr_i3_log2(2.0) == 3
    assert appr_i3_log2(0.5) == -3
    assert appr_i3_log2(0.0) == -128
    assert appr_i3_log2(4.0, weight=2.0) == 4


def test_average_picture_activity_scaling():
    # doubling the linear size halves the sqrt-area term inside the sqrt
    a_small = average_picture_activity(960, 540, False, 10)
    a_big = average_picture_activity(3840, 2160, False, 10)
    assert a_small > a_big
    assert average_picture_activity(1920, 1080, True, 10) > \
        average_picture_activity(1920, 1080, False, 10)


def test_qpa_flat_vs_busy_ctus():
    w, h = 128, 128
    src = _planes(w, h)
    res = apply_qpa_slice(src, None, None, 32, 100.0, 64, 10, 15, True)
    qps = res.ctu_qps.reshape(2, 2)
    # flat top-left CTU gets a lower QP than the noisy ones
    assert qps[0, 0] < qps[0, 1]
    assert qps[0, 0] < qps[1, 0]
    assert np.all(res.ctu_qps >= 0) and np.all(res.ctu_qps <= 63)
    assert res.ctu_lambdas.shape == (4,)
    assert np.all(res.ctu_lambdas > 0)


def test_qpa_temporal_activity_raises_qp():
    w, h = 128, 64
    rng = np.random.RandomState(9)
    a = {0: np.full((h, w), 512, np.int32),
         1: np.full((h // 2, w // 2), 512, np.int32),
         2: np.full((h // 2, w // 2), 512, np.int32)}
    moving = {0: a[0] + rng.randint(-200, 200, (h, w)),
              1: a[1], 2: a[2]}
    static = apply_qpa_slice(a, a, a, 32, 100.0, 64, 10, 15, False)
    busy = apply_qpa_slice(moving, a, a, 32, 100.0, 64, 10, 15, False)
    assert busy.ctu_qps.mean() > static.ctu_qps.mean()


def test_qpa_encode_decode_roundtrip():
    w, h = 96, 64
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(40 + 0.5 * xx + rng.randn(h, w) * 6, 0, 255).astype(np.uint8)
    y[:h // 2, :w // 2] = 90  # flat region
    u = np.clip(128 + 10 * np.sin(xx / 9.0), 0, 255)[::2, ::2].astype(np.uint8)
    v = np.clip(128 - 10 * np.cos(yy / 7.0), 0, 255)[::2, ::2].astype(np.uint8)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=34, ctu_size=32,
                                     qpa=True, deblocking=True))
    au = enc.encode_frame((y, u, v))
    frames = decode_stream(au)
    assert len(frames) == 1
    for c in range(3):
        assert np.array_equal(frames[0].planes[c], enc.last_rec.rec[c])
    # the stream really carries per-CTU QPs (not all equal to slice QP)
    qpm = frames[0].ps.qp_map
    assert len(np.unique(qpm)) > 1


def test_min_noise_levels_clip():
    """clipQPValToEstimatedMinimStats port: unset levels don't clip; a
    known noise floor raises low QPs; neighbors fill blanks."""
    import numpy as np
    from vvenc_tpu.encoder.qpa import (new_min_noise_levels,
                                       update_min_noise_levels,
                                       clip_qp_to_min_stats)
    lv = new_min_noise_levels()
    assert clip_qp_to_min_stats(lv, 10, 512, 1.0, 0, 20) == 20  # all unset
    update_min_noise_levels(lv, 10, 512, 12.0)
    assert lv[4] == 12
    q = clip_qp_to_min_stats(lv, 10, 512, 1.0, 0, 5)
    assert q > 5  # noise floor raises the QP
    assert clip_qp_to_min_stats(lv, 10, 512, 1.0, 0, 50) == 50  # no lower
    # neighbor fill: bucket 3 unset but bucket-4 noise bounds it
    q2 = clip_qp_to_min_stats(lv, 10, 3 << 7, 1.0, 0, 0)
    assert q2 >= 0


def test_qpa_subctu_matches_slice_scale():
    """Sub-CTU adaptation at CTU granularity tracks the slice-level CTU
    adaptation (same model evaluated on the same area)."""
    import numpy as np
    from vvenc_tpu.encoder.qpa import apply_qpa_slice, apply_qpa_subctu
    rng = np.random.RandomState(5)
    w, h = 128, 128
    y = (rng.randint(0, 1024, (h, w))).astype(np.int32)
    y[:64] //= 8  # calm top half, noisy bottom
    orig = {0: y, 1: np.full((h // 2, w // 2), 512, np.int32),
            2: np.full((h // 2, w // 2), 512, np.int32)}
    res = apply_qpa_slice(orig, None, None, 32, 100.0, 64, 10, 30, True)
    subs = [apply_qpa_subctu(orig, None, None, x0, y0, 64, 64, 32, 10, 30,
                             True)
            for y0 in (0, 64) for x0 in (0, 64)]
    # the noisy half must get higher QPs in both models
    assert subs[2] > subs[0] and subs[3] > subs[1]
    assert res.ctu_qps[2] > res.ctu_qps[0]


def test_bim_offsets_zero_mean_and_importance():
    """BIM: static (well-predicted) regions get non-positive offsets vs
    noisy regions; the map is zero-mean (MCTF.cpp:1048-1054)."""
    import numpy as np
    from vvenc_tpu.encoder.mctf import apply_mctf
    from vvenc_tpu.encoder.qpa import new_min_noise_levels
    rng = np.random.RandomState(2)
    w, h, n = 128, 64, 9
    base = rng.randint(0, 255, (h, w)).astype(np.uint8)
    frames = []
    for i in range(n):
        y = base.copy()
        y[:, :64] = np.roll(base[:, :64], i, axis=1)     # moving, coherent
        y[:, 64:] = rng.randint(0, 255, (h, 64))          # temporal noise
        c = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y, c, c))
    mn = new_min_noise_levels()
    out, bim = apply_mctf(frames, 8, 32, 8, bim_ctu_size=64, min_noise=mn)
    assert bim, "no BIM maps produced"
    for poc, off in bim.items():
        assert off.shape == (2,)
        assert abs(int(off.sum())) <= 2  # ~zero mean after normalization
        # noisy CTU (right) is less important (higher QP) than coherent
        assert off[1] >= off[0]
    assert (mn < 255).any(), "min-noise levels never updated"


def test_sao_picture_stats_match_per_ctu_reference():
    """_picture_stats (whole-picture bincount reduction) == the per-CTU
    _eo_stats/_bo_stats golden path."""
    import numpy as np
    from vvenc_tpu.encoder import sao_enc as S
    rng = np.random.RandomState(4)
    h, w, ctu = 72, 104, 32
    n_cols, n_rows = (w + ctu - 1) // ctu, (h + ctu - 1) // ctu
    rec = {0: rng.randint(0, 1024, (h, w)).astype(np.int32),
           1: rng.randint(0, 1024, (h // 2, w // 2)).astype(np.int32),
           2: rng.randint(0, 1024, (h // 2, w // 2)).astype(np.int32)}
    src = {k: np.clip(v + rng.randint(-9, 10, v.shape), 0, 1023)
           .astype(np.int32) for k, v in rec.items()}
    pe, pb = S._picture_stats(src, rec, 10, ctu, n_cols, n_rows)
    for ry in range(n_rows):
        for rx in range(n_cols):
            idx = ry * n_cols + rx
            for comp in range(3):
                sc = 1 if comp else 0
                cs_ = ctu >> sc
                hh, ww = rec[comp].shape
                x0, y0 = rx * cs_, ry * cs_
                x1, y1 = min(x0 + cs_, ww), min(y0 + cs_, hh)
                for ec in range(4):
                    cnt, err = S._eo_stats(rec[comp], src[comp], x0, y0,
                                           x1, y1, ec, ww, hh)
                    assert np.array_equal(cnt[1:], pe[comp][ec][0][idx][1:])
                    assert np.array_equal(err[1:], pe[comp][ec][1][idx][1:])
                cnt, err = S._bo_stats(rec[comp], src[comp], x0, y0, x1,
                                       y1, 10)
                assert np.array_equal(cnt, pb[comp][0][idx])
                assert np.array_equal(err, pb[comp][1][idx])
