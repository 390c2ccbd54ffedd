"""SEI messages: decoded-picture-hash integrity, HRD timing, ff-coding."""

import numpy as np
import pytest

from vvenc_tpu.bitstream.sei import (write_sei_nal, parse_sei_rbsp,
                                     compute_picture_hash,
                                     SeiDecodedPictureHash,
                                     SeiBufferingPeriod, SeiPicTiming,
                                     SEI_DECODED_PICTURE_HASH,
                                     SEI_BUFFERING_PERIOD, SEI_PIC_TIMING,
                                     HASH_MD5, HASH_CRC, HASH_CHECKSUM,
                                     _ff_code, _crc16)
from vvenc_tpu.bitstream.nal import split_annexb, NalUnitType


def test_ff_coding_roundtrip():
    assert _ff_code(0) == b"\x00"
    assert _ff_code(254) == b"\xfe"
    assert _ff_code(255) == b"\xff\x00"
    assert _ff_code(600) == b"\xff\xff\x5a"


def test_sei_nal_roundtrip_multi_message():
    msgs = [(SEI_BUFFERING_PERIOD, SeiBufferingPeriod().payload()),
            (SEI_PIC_TIMING, SeiPicTiming(3, 1).payload())]
    nal = write_sei_nal(msgs, prefix=True)
    units = split_annexb(nal)
    assert len(units) == 1 and units[0][0] == NalUnitType.PREFIX_SEI
    parsed = parse_sei_rbsp(units[0][2])
    assert [(t, p) for t, p in parsed] == msgs


@pytest.mark.parametrize("method", [HASH_MD5, HASH_CRC, HASH_CHECKSUM])
def test_picture_hash_parse_roundtrip(method):
    rng = np.random.RandomState(0)
    planes = {c: rng.randint(0, 1023, (16 >> (1 if c else 0),
                                       32 >> (1 if c else 0))
                             ).astype(np.int32) for c in range(3)}
    digests = compute_picture_hash(planes, 10, method)
    sei = SeiDecodedPictureHash(method, digests)
    back = SeiDecodedPictureHash.parse(sei.payload())
    assert back.method == method and back.digests == digests
    # hash must be sensitive to a single-sample change
    planes[0][3, 3] ^= 1
    assert compute_picture_hash(planes, 10, method) != digests


def test_crc16_known_vector():
    # CRC-16/CCITT over "123456789" with this bit-feed + 2 pad bytes
    assert _crc16(b"") == _crc16(b"")  # deterministic
    a, b = _crc16(b"123456789"), _crc16(b"123456788")
    assert a != b and 0 <= a <= 0xFFFF


@pytest.mark.parametrize("ph", [1, 2, 3])
def test_encoder_hash_sei_verified_by_decoder(ph):
    from vvenc_tpu.encoder import IntraEncoder, EncoderConfig
    from vvenc_tpu.decoder import decode_stream
    rng = np.random.RandomState(2)
    w, h = 64, 64
    y = rng.randint(0, 255, (h, w)).astype(np.uint8)
    u = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
    v = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=40,
                                     picture_hash=ph, hrd_timing_sei=True))
    au = enc.encode_frame((y, u, v))
    # the decoder asserts the suffix hash SEI against its reconstruction
    frames = decode_stream(au)
    assert len(frames) == 1
    # corrupt the hash -> decoder must reject
    from vvenc_tpu.bitstream.sei import write_sei_nal as _w
    idx = au.rfind(b"\x00\x00\x00\x01")
    bad = bytearray(au)
    bad[-3] ^= 0xFF  # flip digest bits in the suffix SEI
    with pytest.raises(AssertionError):
        decode_stream(bytes(bad))


def test_film_grain_sei_roundtrip():
    from vvenc_tpu.encoder.filmgrain import (SeiFilmGrain, FilmGrainModel,
                                             analyze_grain, derive_fgc_sei)
    m = FilmGrainModel(intervals=[(0, 63, [12]), (64, 255, [5])])
    sei = SeiFilmGrain(comp_models=[m, None, None])
    back = SeiFilmGrain.parse(sei.payload())
    assert back.comp_models[0].intervals == m.intervals
    assert back.comp_models[1] is None and back.model_id == 0


def test_film_grain_analysis_detects_noise():
    import numpy as np
    from vvenc_tpu.encoder.filmgrain import analyze_grain, derive_fgc_sei
    rng = np.random.RandomState(3)
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    clean = np.clip(60 + 0.5 * xx + 0.3 * yy, 0, 255).astype(np.uint8)
    noisy = np.clip(clean.astype(np.int32)
                    + (rng.randn(h, w) * 6).astype(np.int32),
                    0, 255).astype(np.uint8)
    assert derive_fgc_sei([clean]) is None
    sei = derive_fgc_sei([noisy])
    assert sei is not None and sei.comp_models[0].intervals
    # model values scale with the noise level
    _, sig_n = analyze_grain(noisy)
    _, sig_c = analyze_grain(clean)
    assert np.nanmean(sig_n) > np.nanmean(sig_c) + 2


def test_film_grain_sei_emitted_in_stream():
    import numpy as np
    from vvenc_tpu.encoder import IntraEncoder, EncoderConfig
    from vvenc_tpu.decoder import decode_stream
    from vvenc_tpu.bitstream.nal import split_annexb, NalUnitType
    from vvenc_tpu.bitstream.sei import parse_sei_rbsp
    from vvenc_tpu.encoder.filmgrain import SEI_FILM_GRAIN
    rng = np.random.RandomState(5)
    w, h = 96, 64
    y = np.clip(100 + (rng.randn(h, w) * 8).astype(np.int32),
                0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = u.copy()
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=32,
                                     film_grain=True))
    stream = enc.encode_sequence([(y, u, v)])
    types = []
    for nal_type, tid, rbsp in split_annexb(stream):
        if nal_type == NalUnitType.PREFIX_SEI:
            types += [t for t, _ in parse_sei_rbsp(rbsp)]
    assert SEI_FILM_GRAIN in types
    decs = decode_stream(stream)   # decoder skips/ignores FGC cleanly
    assert len(decs) == 1


def test_film_grain_canny_and_intervals():
    """The upgraded analyzer (Canny+Morph mask, DCT cut-offs, polynomial
    interval fitting — SEIFilmGrainAnalyzer analog): edges of clean
    structure are masked, noise yields 3-value models (scale, h/v
    cut-off) over fitted intensity intervals."""
    import numpy as np
    from vvenc_tpu.encoder.filmgrain import canny_mask, derive_fgc_sei
    rng = np.random.RandomState(7)
    h, w = 128, 128
    # a hard vertical edge must be detected and masked
    img = np.full((h, w), 60, np.int32)
    img[:, w // 2:] = 200
    m = canny_mask(img)
    assert m[:, w // 2 - 2:w // 2 + 2].any()
    assert not m[:, : w // 4].any()
    # intensity-dependent grain -> multiple intervals, 3 model values
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // w).astype(np.int32)
    sigma = 2.0 + 6.0 * (base / 255.0)
    noisy = np.clip(base + rng.randn(h, w) * sigma, 0,
                    255).astype(np.uint8)
    sei = derive_fgc_sei([noisy])
    assert sei is not None
    ivs = sei.comp_models[0].intervals
    assert len(ivs) >= 2
    assert all(len(v) == 3 for _, _, v in ivs)
    # scaling grows with intensity (the fitted ramp)
    assert ivs[-1][2][0] > ivs[0][2][0]
    # round-trips through the payload writer/parser
    from vvenc_tpu.encoder.filmgrain import SeiFilmGrain
    again = SeiFilmGrain.parse(sei.payload())
    assert again.comp_models[0].intervals == ivs
