"""HLS parser/writer consistency against reference-encoder golden streams.

The golden streams in tests/data were produced by the reference encoder
(options in tests/data/golden_options.txt).  Parsing them and re-serializing
must reproduce the exact bytes — this pins our SPS/PPS/PH/SH syntax to
streams known to be spec-conformant.
"""

import os

import pytest

from vvenc_tpu.bitstream.bitwriter import BitReader, BitWriter
from vvenc_tpu.bitstream.nal import split_annexb, NalUnitType
from vvenc_tpu.bitstream import hls

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN_F1 = os.path.join(DATA, "golden_ai_minimal_416x240_qp37_f1.266")
GOLDEN_F3 = os.path.join(DATA, "golden_ai_qt_416x240_qp37_f3.266")


def _load(path):
    with open(path, "rb") as f:
        return split_annexb(f.read())


@pytest.fixture(scope="module")
def golden_units():
    return _load(GOLDEN_F1)


def _get(units, nal_type):
    return next(u for u in units if u[0] == nal_type)


def test_parse_sps_fields(golden_units):
    _, _, rbsp = _get(golden_units, NalUnitType.SPS)
    sps = hls.parse_sps(BitReader(rbsp))
    assert (sps.max_width, sps.max_height) == (416, 240)
    assert sps.bit_depth == 10
    assert sps.ctu_size == 32
    assert sps.chroma_format_idc == 1
    assert sps.min_qt_size[0] == 8
    assert sps.max_mtt_depth[0] == 0
    assert not sps.dual_i_tree and not sps.sao_enabled and not sps.alf_enabled
    assert not sps.dep_quant_enabled and not sps.sign_data_hiding
    assert not sps.mts and not sps.lfnst and not sps.mip and not sps.isp


def test_sps_reserialize_bit_exact(golden_units):
    _, _, rbsp = _get(golden_units, NalUnitType.SPS)
    sps = hls.parse_sps(BitReader(rbsp))
    bw = BitWriter()
    hls.write_sps(bw, sps)
    assert bw.get_bytes() == rbsp


def test_pps_reserialize_bit_exact(golden_units):
    _, _, sps_rbsp = _get(golden_units, NalUnitType.SPS)
    sps = hls.parse_sps(BitReader(sps_rbsp))
    _, _, rbsp = _get(golden_units, NalUnitType.PPS)
    pps = hls.parse_pps(BitReader(rbsp), sps)
    bw = BitWriter()
    hls.write_pps(bw, pps, sps)
    assert bw.get_bytes() == rbsp


@pytest.mark.parametrize("path", [GOLDEN_F1, GOLDEN_F3])
def test_slice_header_reserialize_bit_exact(path):
    units = _load(path)
    _, _, sps_rbsp = _get(units, NalUnitType.SPS)
    sps = hls.parse_sps(BitReader(sps_rbsp))
    _, _, pps_rbsp = _get(units, NalUnitType.PPS)
    pps = hls.parse_pps(BitReader(pps_rbsp), sps)
    n_slices = 0
    for t, tid, rbsp in units:
        if t not in (NalUnitType.IDR_N_LP, NalUnitType.IDR_W_RADL,
                     NalUnitType.CRA, NalUnitType.TRAIL):
            continue
        br = BitReader(rbsp)
        sh = hls.parse_slice_header(br, sps, pps,
                                    is_idr=t in (NalUnitType.IDR_N_LP,
                                                 NalUnitType.IDR_W_RADL))
        assert sh.slice_type == 2
        assert sh.slice_qp == 34  # QP 37 + IntraQPOffset -3
        header_bits = br.pos_bits
        assert header_bits % 8 == 0
        # re-serialize the header (incl. byte alignment) and compare
        bw = BitWriter()
        hls.write_slice_header(bw, sh, sps, pps,
                               is_idr=t in (NalUnitType.IDR_N_LP,
                                            NalUnitType.IDR_W_RADL))
        bw.write_byte_alignment()
        assert bw.get_bytes() == rbsp[:header_bits // 8]
        n_slices += 1
    assert n_slices >= 1


def test_sps_vui_roundtrip():
    """VUI write + parse round-trip incl. the byte-counted payload
    (H.266 7.3.4.2; vvenc VLCWriter.cpp:1035-1053)."""
    from vvenc_tpu.bitstream.params import SPS, VUI, detect_level
    from vvenc_tpu.bitstream.hls import write_sps, parse_sps
    from vvenc_tpu.bitstream.bitwriter import BitWriter, BitReader
    s = SPS()
    s.max_width, s.max_height = 416, 240
    s.vui_present = 1
    s.vui = VUI(progressive_source=1, aspect_ratio_info_present=1,
                aspect_ratio_idc=255, sar_width=4, sar_height=3,
                colour_description_present=1, colour_primaries=9,
                transfer_characteristics=16, matrix_coefficients=9,
                video_full_range=1, chroma_loc_info_present=1,
                chroma_sample_loc_type=2)
    bw = BitWriter()
    write_sps(bw, s)
    s2 = parse_sps(BitReader(bw.get_bytes()))
    assert s2.vui_present and s2.vui is not None
    for f in ("aspect_ratio_idc", "sar_width", "sar_height",
              "colour_primaries", "transfer_characteristics",
              "matrix_coefficients", "video_full_range",
              "chroma_sample_loc_type"):
        assert getattr(s2.vui, f) == getattr(s.vui, f), f
    # level auto-detection anchors (H.266 Table A.1/A.2)
    assert detect_level(416, 240, 30) == 32       # 2.0
    assert detect_level(1920, 1080, 60) == 67     # 4.1
    assert detect_level(3840, 2160, 60) == 83     # 5.1
