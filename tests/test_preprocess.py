"""PreProcess stage: visual activity, scene-cut (STA), SCC detection."""

import numpy as np

from vvenc_tpu.encoder.preprocess import (PreProcess, detect_scc,
                                          picture_visual_activity)


def _camera_frame(t, w=96, h=64, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(80 + 60 * np.sin((xx + 3 * t) / 9.0)
                   + 40 * np.cos((yy + 2 * t) / 7.0)
                   + rng.randn(h, w) * 2, 0, 255).astype(np.uint8)


def _screen_frame(w=96, h=64):
    """Text-like: flat background, sharp high-contrast glyph blocks."""
    y = np.full((h, w), 235, np.uint8)
    for r in range(4, h - 4, 8):
        for c in range(4, w - 4, 6):
            if (r // 8 + c // 6) % 3:
                y[r:r + 5, c:c + 3] = 16
    return y


def test_scene_cut_detection():
    pp = PreProcess(frame_rate=30)
    for t in range(4):
        pp.push(_camera_frame(t))
    # hard cut: totally different content
    for t in range(4, 8):
        pp.push(255 - _camera_frame(3 * t + 40, seed=5))
    cuts = [r.poc for r in pp.results if r.is_scene_cut]
    assert cuts == [4]


def test_scc_detection():
    assert detect_scc(_screen_frame())
    assert not detect_scc(_camera_frame(0))


def test_visual_activity_monotonic_in_noise():
    quiet = _camera_frame(0)
    rng = np.random.RandomState(1)
    noisy = np.clip(quiet.astype(np.int32)
                    + (rng.randn(*quiet.shape) * 12).astype(np.int32),
                    0, 255).astype(np.uint8)
    sp_q, _ = picture_visual_activity(quiet, None, None)
    sp_n, _ = picture_visual_activity(noisy, None, None)
    assert sp_n > sp_q > 0


def test_adaptive_idr_on_scene_cut():
    """IPPP encode inserts an IDR at the detected cut; stream decodes."""
    from vvenc_tpu.encoder import IntraEncoder, EncoderConfig
    from vvenc_tpu.decoder import decode_stream
    frames = []
    for t in range(4):
        y = _camera_frame(t)
        frames.append((y, (y[::2, ::2] // 2 + 60).astype(np.uint8),
                       (128 - y[::2, ::2] // 3).astype(np.uint8)))
    for t in range(4):
        y = 255 - _camera_frame(3 * t + 40, seed=5)
        frames.append((y, (y[::2, ::2] // 2 + 60).astype(np.uint8),
                       (128 - y[::2, ::2] // 3).astype(np.uint8)))
    enc = IntraEncoder(EncoderConfig(width=96, height=64, qp=34,
                                     intra_period=100))
    stream = enc.encode_sequence(frames)
    from vvenc_tpu.bitstream.params import SLICE_I
    assert enc.slice_type_by_poc[4] == SLICE_I      # cut -> IDR
    assert enc.slice_type_by_poc[2] != SLICE_I
    decs = sorted(decode_stream(stream), key=lambda f: f.poc)
    assert len(decs) == 8
    for c in range(3):
        assert np.array_equal(decs[-1].planes[c], enc.last_rec.rec[c])
