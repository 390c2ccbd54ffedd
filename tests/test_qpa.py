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
