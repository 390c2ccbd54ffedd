"""LMCS unit tests: LUT model, APS syntax round-trip, encoder derivation.

The derivation expectations are pinned against reference-encoder APS
payloads (vvencFFapp --LMCS 1 on the lmcs_clip generator content, see
tests/data/golden_options.txt); decode-side conformance lives in
test_decoder_conformance.py.
"""

import numpy as np
import pytest

from vvenc_tpu.codec.lmcs import (LmcsParam, ReshapeState, write_lmcs_aps,
                                  read_lmcs_payload, scale_chroma_resi_inv,
                                  PIC_CODE_CW_BINS)
from vvenc_tpu.bitstream.bitwriter import BitWriter, BitReader


def _clip_frame(idx: int):
    """Frame of the lmcs_clip generator (10-bit internal)."""
    W, H = 416, 240
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    planes = None
    for i in range(idx + 1):
        t = i
        y = (128 + 60 * np.sin((xx + 3 * t) / 7.0)
             * np.cos((yy - 2 * t) / 9.0)).astype(np.float32)
        y[40:90, 40:120] = 90 + t
        cb = (((xx // 4).astype(int) + (yy // 4).astype(int) + t) % 2) \
            * 120 + 60
        y[140:220, 200:380] = cb[140:220, 200:380]
        y += rng.randn(H, W) * 2
        y8 = np.clip(y, 0, 255).astype(np.int64)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + 2 * t) / 11.0),
                    0, 255).astype(np.int64)
        v = np.clip(130 + 40 * np.cos((yy[::2, ::2] - t) / 13.0),
                    0, 255).astype(np.int64)
        planes = (y8 << 2, u << 2, v << 2)
    return planes


def test_aps_roundtrip():
    p = LmcsParam()
    p.min_bin_idx = 1
    p.max_bin_idx = 14
    p.bin_cw_delta = [0, 6, 6, 5, 7, 7, 6, 6, 6, 6, 6, 5, 6, 6, 6, 0]
    p.max_nbits_delta_cw = 3
    p.crs_offset = 6
    bw = BitWriter()
    write_lmcs_aps(bw, 0, p)
    data = bw.get_bytes()
    br = BitReader(data)
    assert br.read(3) == 1 and br.read(5) == 0 and br.read_flag() == 1
    q = read_lmcs_payload(br, True)
    assert q.min_bin_idx == p.min_bin_idx
    assert q.max_bin_idx == p.max_bin_idx
    assert q.bin_cw_delta == p.bin_cw_delta
    assert q.crs_offset == 6


def test_reshape_luts_invertible():
    p = LmcsParam()
    p.min_bin_idx = 1
    p.max_bin_idx = 14
    p.bin_cw_delta = [0, 8, 8, 7, 9, 8, 8, 8, 8, 8, 8, 7, 8, 8, 8, 0]
    p.crs_offset = 6
    rs = ReshapeState(p, 10)
    # within the mapped range the inverse must undo the forward mapping
    # to within the PWL rounding (<= 1 codeword)
    x = np.arange(64, 960)
    err = np.abs(rs.inv_lut[rs.fwd_lut[x]] - x)
    assert err.max() <= 1
    # monotonic non-decreasing LUTs
    assert np.all(np.diff(rs.fwd_lut) >= 0)
    assert np.all(np.diff(rs.inv_lut) >= 0)


def test_chroma_scale_identity_when_bins_uniform():
    p = LmcsParam()  # all deltas zero -> identity mapping
    rs = ReshapeState(p, 10, True)
    assert rs.chroma_adj_from_luma(512) == (1 << 11)
    r = np.array([[5, -7], [0, 100]], np.int64)
    out = scale_chroma_resi_inv(r, 1 << 11, 10)
    assert np.array_equal(out, r)


@pytest.mark.parametrize("update_ctrl,frame,qp,expected_deltas,expected_en", [
    # pinned against vvencFFapp --LMCS 1 --LMCSUpdateCtrl 1 (AI, q27)
    (1, 0, 26, [0, 6, 6, 5, 7, 7, 6, 6, 6, 6, 6, 5, 6, 6, 6, 0], True),
    # pinned against vvencFFapp --LMCS 1 --LMCSUpdateCtrl 0 (RA, q27):
    # model derived on the IDR (frame 7), I-slice reshaping disabled
    # (intraAdp=false), inter slices enabled
    (0, 7, 27, [0, 8, 8, 7, 9, 8, 8, 8, 8, 8, 8, 7, 8, 8, 8, 0], False),
])
def test_encoder_derivation_matches_reference(update_ctrl, frame, qp,
                                              expected_deltas, expected_en):
    from vvenc_tpu.encoder.lmcs_enc import LmcsEncoder
    planes = _clip_frame(frame)
    enc = LmcsEncoder(10, qp, 416 * 240, update_ctrl=update_ctrl,
                      crs_offset=6)
    enabled, present, chroma = enc.init_picture(planes, frame, True, 0)
    assert present
    assert enabled == expected_en
    p = enc.cur_param
    assert p.bin_cw_delta == expected_deltas
    assert p.min_bin_idx == 1 and p.max_bin_idx == 14


def test_inter_slice_enable_rule():
    from vvenc_tpu.encoder.lmcs_enc import LmcsEncoder
    planes = _clip_frame(0)
    enc = LmcsEncoder(10, 27, 416 * 240, update_ctrl=0, crs_offset=6)
    enc.init_picture(planes, 0, True, 0)
    # updateCtrl 0 intraAdp=False -> rate_adp_mode 0, tcase 0:
    # inter slices (rspTid = tl+1) enable when tcase < 5 -> tid >= tcase+1
    en, present, chroma = enc.init_picture(planes, 1, False, 2)
    assert not present
    assert en
