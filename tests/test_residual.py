"""Residual coding round-trip tests (encoder -> decoder exactness)."""

import numpy as np
import pytest

from vvenc_tpu.bitstream.bitwriter import BitWriter, BitReader
from vvenc_tpu.bitstream.cabac import CabacEncoder, CabacDecoder
from vvenc_tpu.bitstream.residual import (
    encode_residual, decode_residual, scan_info)


def test_scan_small():
    sx, sy, blk, cg, lcw, lch = scan_info(2, 2)  # 4x4
    # up-right diagonal: (0,0),(0,1),(1,0),(0,2),(1,1),(2,0)...
    expect = [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0)]
    got = list(zip(sx[:6].tolist(), sy[:6].tolist()))
    assert got == expect
    assert (lcw, lch) == (2, 2)


def test_scan_grouped_8x8():
    sx, sy, blk, cg, lcw, lch = scan_info(3, 3)
    assert (lcw, lch) == (2, 2)
    # first 16 positions confined to the top-left 4x4 CG
    assert sx[:16].max() < 4 and sy[:16].max() < 4
    # CG order diagonal over 2x2 groups: (0,0),(0,1),(1,0),(1,1)
    assert cg.tolist() == [0, 2, 1, 3]
    assert len(sx) == 64


def _roundtrip_tu(coeff, is_luma, qp=37):
    bw = BitWriter()
    enc = CabacEncoder(bw)
    enc.init_ctx(qp, 2)
    encode_residual(enc, coeff, is_luma)
    enc.encode_bin_trm(1)
    enc.finish()
    bw.align_zero()
    dec = CabacDecoder(BitReader(bw.get_bytes()))
    dec.init_ctx(qp, 2)
    out = decode_residual(dec, coeff.shape[1], coeff.shape[0], is_luma)
    return out, len(bw.get_bytes())


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32),
                                   (4, 8), (8, 4), (16, 4), (4, 32), (2, 8),
                                   (8, 2), (2, 2)])
@pytest.mark.parametrize("is_luma", [True, False])
def test_residual_roundtrip_sparse(shape, is_luma):
    rng = np.random.RandomState(hash(shape) % 2**31)
    h, w = shape
    for trial in range(8):
        coeff = np.zeros((h, w), dtype=np.int32)
        nnz = rng.randint(1, max(2, (h * w) // 3))
        pos = rng.choice(h * w, size=nnz, replace=False)
        vals = rng.randint(-10, 10, size=nnz)
        vals[vals == 0] = 1
        coeff.reshape(-1)[pos] = vals
        # bias energy toward DC like real transforms
        coeff[0, 0] = rng.randint(-100, 100) or 5
        out, _ = _roundtrip_tu(coeff, is_luma)
        assert np.array_equal(out, coeff), (shape, trial)


@pytest.mark.parametrize("is_luma", [True, False])
def test_residual_roundtrip_dense_large_values(is_luma):
    rng = np.random.RandomState(99)
    for shape in [(8, 8), (16, 16), (32, 32)]:
        h, w = shape
        coeff = rng.randint(-300, 300, size=(h, w)).astype(np.int32)
        if not coeff.any():
            coeff[0, 0] = 1
        out, _ = _roundtrip_tu(coeff, is_luma)
        assert np.array_equal(out, coeff), shape


def test_residual_roundtrip_extreme_values():
    coeff = np.zeros((8, 8), dtype=np.int32)
    coeff[0, 0] = 32767
    coeff[7, 7] = -32768 + 1
    coeff[3, 4] = 1
    out, _ = _roundtrip_tu(coeff, True)
    assert np.array_equal(out, coeff)


def test_residual_single_dc():
    coeff = np.zeros((16, 16), dtype=np.int32)
    coeff[0, 0] = -1
    out, nbytes = _roundtrip_tu(coeff, True)
    assert np.array_equal(out, coeff)
    assert nbytes < 8  # tiny payload


def test_residual_remregbins_exhaustion():
    """Dense small-size blocks exercise the bypass tail path."""
    rng = np.random.RandomState(5)
    coeff = rng.randint(-40, 40, size=(4, 4)).astype(np.int32)
    coeff[coeff == 0] = 3
    out, _ = _roundtrip_tu(coeff, True)
    assert np.array_equal(out, coeff)


def test_sdh_encode_decode_roundtrip():
    """Sign-data hiding: parity-adjusted levels + dropped sign bit decode
    back exactly (per-TU, randomized)."""
    import numpy as np
    from vvenc_tpu.bitstream.bitwriter import BitWriter, BitReader
    from vvenc_tpu.bitstream.cabac import CabacEncoder, CabacDecoder
    from vvenc_tpu.bitstream.residual import (encode_residual,
                                              decode_residual)
    from vvenc_tpu.ops.transforms import sdh_adjust
    rng = np.random.RandomState(11)
    hidden = 0
    for trial in range(30):
        w = h = int(rng.choice([4, 8, 16]))
        tcoef = (rng.randn(h, w) * 300).astype(np.int32)
        tcoef *= rng.rand(h, w) < 0.6
        from vvenc_tpu.ops.transforms import quant_np
        q = quant_np(tcoef, 30, 10)
        q2 = sdh_adjust(q, tcoef, 30, 10)
        if not np.any(q2):
            continue
        if not np.array_equal(q, q2):
            hidden += 1
        bw = BitWriter()
        enc = CabacEncoder(bw)
        enc.init_ctx(30, 2)
        encode_residual(enc, q2, True, sign_hiding=True)
        enc.encode_bin_trm(1)
        enc.finish()
        bw.write_rbsp_trailing_bits()
        dec = CabacDecoder(BitReader(bw.get_bytes()))
        dec.init_ctx(30, 2)
        out = decode_residual(dec, w, h, True, sign_hiding=True)
        assert np.array_equal(out, q2), trial
    assert hidden > 0  # the parity fixup must have engaged somewhere


def test_sdh_encoder_e2e():
    import numpy as np
    from vvenc_tpu.encoder import IntraEncoder, EncoderConfig
    from vvenc_tpu.decoder import decode_stream
    rng = np.random.RandomState(3)
    w, h = 128, 64
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(60 + 120 * np.sin(xx / 11.) * np.cos(yy / 7.)
                + rng.randn(h, w) * 5 + 60, 0, 255).astype(np.uint8)
    u = np.clip(80 + 0.5 * y, 0, 255)[::2, ::2].astype(np.uint8)
    v = np.clip(200 - 0.4 * y, 0, 255)[::2, ::2].astype(np.uint8)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=27,
                                     sign_data_hiding=True))
    au = enc.encode_frame((y, u, v))
    dec = decode_stream(au)[0]
    for c in range(3):
        assert np.array_equal(dec.planes[c], enc.last_rec.rec[c])
