"""VVEncImpl streaming API: state machine + equivalence with the batch
encoder (vvenc vvencimpl.cpp lifecycle analog)."""

import numpy as np

from vvenc_tpu.api import (VVEncImpl, State, VVENC_OK,
                           VVENC_ERR_INITIALIZE, VVENC_ERR_PARAMETER,
                           VVENC_ERR_UNSPECIFIED)
from vvenc_tpu.config.config import VvencTpuConfig
from vvenc_tpu.decoder.decoder import decode_stream
from vvenc_tpu.encoder.intra_encoder import IntraEncoder, EncoderConfig


def _frames(w, h, n, seed=5):
    rng = np.random.RandomState(seed)
    base = rng.randint(40, 200, (h + n, w + n)).astype(np.uint8)
    out = []
    for t in range(n):
        y = base[t:t + h, t:t + w]
        u = np.full((h // 2, w // 2), 100 + 3 * t, np.uint8)
        out.append((y, u, 255 - u))
    return out


def test_state_machine():
    impl = VVEncImpl()
    # encode before init
    _, _, rc = impl.encode(None)
    assert rc == VVENC_ERR_INITIALIZE
    cfg = VvencTpuConfig(width=64, height=64, qp=32, ctu_size=32)
    assert impl.init(cfg) == VVENC_OK
    assert impl.state == State.INITIALIZED
    # double init
    assert impl.init(cfg) == VVENC_ERR_INITIALIZE
    fr = _frames(64, 64, 1)[0]
    au, done, rc = impl.encode(fr)
    assert rc == VVENC_OK and not done and au
    au, done, rc = impl.encode(None)
    assert rc == VVENC_OK and done
    # encode after flush
    _, _, rc = impl.encode(fr)
    assert rc == VVENC_ERR_UNSPECIFIED
    assert impl.close() == VVENC_OK
    assert impl.state == State.UNINITIALIZED
    # bad parameter
    impl2 = VVEncImpl()
    assert impl2.init(VvencTpuConfig(width=0, height=64)) \
        == VVENC_ERR_PARAMETER


def test_streaming_matches_batch_all_intra():
    w, h, n = 64, 64, 3
    frames = _frames(w, h, n)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=32,
                                     ctu_size=32, intra_period=1))
    batch = enc.encode_sequence(frames)
    impl = VVEncImpl()
    assert impl.init(VvencTpuConfig(width=w, height=h, qp=32,
                                    ctu_size=32, intra_period=1)) \
        == VVENC_OK
    stream = bytearray()
    for f in frames:
        au, _, rc = impl.encode(f)
        assert rc == VVENC_OK
        stream += au
    au, done, _ = impl.encode(None)
    stream += au
    assert done and bytes(stream) == batch


def test_streaming_matches_batch_ra():
    w, h, n = 64, 64, 11
    frames = _frames(w, h, n)
    kw = dict(width=w, height=h, qp=32, ctu_size=32, intra_period=0,
              gop_size=4, deblocking=True, sao=True)
    enc = IntraEncoder(EncoderConfig(**{k: (bool(v) if k in
                                            ("deblocking", "sao") else v)
                                        for k, v in kw.items()}))
    batch = enc.encode_sequence(frames)
    impl = VVEncImpl()
    assert impl.init(VvencTpuConfig(width=w, height=h, qp=32,
                                    ctu_size=32, intra_period=0,
                                    gop_size=4, deblocking=1, sao=1)) \
        == VVENC_OK
    stream = bytearray()
    emitted = []
    for f in frames:
        au, _, rc = impl.encode(f)
        assert rc == VVENC_OK
        stream += au
        emitted.append(len(au))
    au, done, _ = impl.encode(None)
    stream += au
    assert done
    assert bytes(stream) == batch, "streaming != batch bitstream"
    # bursty emission: buffering until the GOP closes
    assert any(e == 0 for e in emitted[1:5])
    dec = decode_stream(bytes(stream))
    assert len(dec) == n


def test_streaming_matches_batch_ra_mctf():
    """Streaming with bounded-window MCTF (+BIM) is byte-identical to the
    batch CLI path for the same cfg (VERDICT round-1 item 9; the EncStage
    queue-discipline analog: MCTF lead = +-RANGE input pictures)."""
    from vvenc_tpu.encoder.mctf import apply_mctf
    frames = _frames(64, 64, 20, seed=9)
    cfg = VvencTpuConfig(width=64, height=64, qp=34, ctu_size=32,
                         gop_size=8, intra_period=0, mctf=2, bim=1)
    ecfg = EncoderConfig(width=64, height=64, qp=34, ctu_size=32,
                         gop_size=8, intra_period=0, mctf=True, bim=True)
    enc = IntraEncoder(ecfg)
    batch = enc.encode_sequence(list(frames))

    impl = VVEncImpl()
    assert impl.init(cfg) == VVENC_OK
    stream = bytearray()
    for f in frames:
        au, done, rc = impl.encode(f)
        assert rc == VVENC_OK
        stream += au
    au, done, rc = impl.encode(None)
    assert rc == VVENC_OK and done
    stream += au
    assert bytes(stream) == batch, "streaming+MCTF != batch bitstream"
    assert len(decode_stream(bytes(stream))) == 20


def test_drap_period_mode():
    """Dependent-RAP mode (vvenc m_drapPeriod analog): the DRAP anchor
    references only the IDR, trailing pictures never reach below the
    DRAP (except the IDR), the DRAP SEI is emitted, and streaming
    output stays byte-identical to batch."""
    import numpy as np
    from vvenc_tpu.encoder import IntraEncoder, EncoderConfig
    from vvenc_tpu.encoder.intra_encoder import IntraEncoder as _IE
    from vvenc_tpu.decoder import decode_stream
    from vvenc_tpu.bitstream.nal import split_annexb, NalUnitType
    from vvenc_tpu.bitstream.sei import parse_sei_rbsp, SEI_DEPENDENT_RAP

    w, h = 96, 48
    rng = np.random.RandomState(9)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(25):
        y = np.clip(100 + 60 * np.sin((xx + 3 * t) / 9.0)
                    + rng.randn(h, w) * 2, 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    kw = dict(width=w, height=h, qp=34, ctu_size=32, intra_period=0,
              gop_size=8, deblocking=True, drap_period=16, mctf=False)
    seen = {}
    orig = _IE._encode_picture

    def spy(self, poc, fr, st, l0, l1, *a, **k):
        seen[poc] = (list(l0), list(l1))
        return orig(self, poc, fr, st, l0, l1, *a, **k)

    _IE._encode_picture = spy
    try:
        enc = IntraEncoder(EncoderConfig(**kw))
        stream = enc.encode_sequence(frames)
    finally:
        _IE._encode_picture = orig
    # DRAP anchor at POC 16 references only the IDR
    assert seen[16] == ([0], [])
    # trailing pictures (POC > 16) never reference below the DRAP
    for poc, (l0, l1) in seen.items():
        if poc > 16:
            assert all(r >= 16 or r == 0 for r in l0 + l1), (poc, l0, l1)
    # the DRAP indication SEI is in the stream
    found = False
    for nt, _, payload in split_annexb(stream):
        if nt == NalUnitType.PREFIX_SEI:
            for pt, _ in parse_sei_rbsp(payload):
                if pt == SEI_DEPENDENT_RAP:
                    found = True
    assert found, "DRAP SEI missing"
    # stream decodes fully and matches the encoder recon
    dec = sorted(decode_stream(stream), key=lambda f: f.poc)
    assert len(dec) == 25
    for fr in dec:
        for c in range(3):
            assert np.array_equal(fr.planes[c], enc.recs_by_poc[fr.poc][c])
    # streaming parity with DRAP enabled
    from vvenc_tpu.api import VVEncImpl, VVENC_OK
    from vvenc_tpu.config.config import VvencTpuConfig
    cfg = VvencTpuConfig(width=w, height=h, qp=34, ctu_size=32,
                         intra_period=0, gop_size=8, deblocking=1,
                         drap_period=16)
    impl = VVEncImpl()
    assert impl.init(cfg) == VVENC_OK
    out = b""
    for f in frames:
        au, done, rc = impl.encode(f)
        assert rc == VVENC_OK
        out += au
    au, done, rc = impl.encode(None)
    out += au
    assert out == stream


def test_drap_irap_survives_dpb_trim():
    """Regression (round-2 advisor, high): once the sequence outgrows the
    16-entry DPB the associated IRAP (POC 0) must stay protected so the
    third DRAP can still reference it — previously _trim_dpb evicted it
    (KeyError: 0 at the POC-32 DRAP with 40 frames, gop 8, period 16)."""
    from vvenc_tpu.decoder import decode_stream

    w, h = 64, 32
    frames = _frames(w, h, 41, seed=11)
    cfg = EncoderConfig(width=w, height=h, qp=37, ctu_size=32,
                        intra_period=0, gop_size=8, drap_period=16,
                        mctf=False, deblocking=False)
    enc = IntraEncoder(cfg)
    stream = enc.encode_sequence(frames)
    dec = sorted(decode_stream(stream), key=lambda f: f.poc)
    assert len(dec) == 41
    for fr in dec:
        for c in range(3):
            assert np.array_equal(fr.planes[c], enc.recs_by_poc[fr.poc][c])


def test_drap_period_validation():
    """check_config rejects unsound drap_period combinations (round-2
    advisor, low): non-multiple of gop_size, or multiple IRAPs."""
    import pytest
    from vvenc_tpu.config.config import check_config

    base = dict(width=64, height=64, qp=32, gop_size=8)
    with pytest.raises(ValueError):
        check_config(VvencTpuConfig(drap_period=12, **base))
    with pytest.raises(ValueError):
        check_config(VvencTpuConfig(drap_period=16, intra_period=32,
                                    **base))
    check_config(VvencTpuConfig(drap_period=16, **base))


def test_packed10_yuv_io_roundtrip(tmp_path):
    """Packed 10-bit YUV (4 samples / 5 bytes) + MSB extension
    (YuvFileIO packed mode / MSBExtendedBitDepth analogs)."""
    import numpy as np
    from vvenc_tpu.utils.yuv_io import (read_yuv_packed10,
                                        write_yuv_packed10, msb_extend)
    rng = np.random.RandomState(2)
    w, h = 64, 32
    frames = []
    for _ in range(3):
        frames.append(tuple(
            rng.randint(0, 1024, s).astype(np.uint16)
            for s in ((h, w), (h // 2, w // 2), (h // 2, w // 2))))
    path = str(tmp_path / "p.yuv")
    write_yuv_packed10(path, frames)
    got = list(read_yuv_packed10(path, w, h))
    assert len(got) == 3
    for f0, f1 in zip(frames, got):
        for a, b in zip(f0, f1):
            assert np.array_equal(a, b)
    # MSB extension: 8-bit samples to 10-bit and Rec.709-clipped back
    p8 = rng.randint(0, 256, (h, w)).astype(np.uint8)
    p10 = msb_extend(p8, 8, 10)
    assert np.array_equal(p10, p8.astype(np.uint16) << 2)
    back = msb_extend(p10, 10, 8, clip_rec709=True)
    assert back.min() >= 1 and back.max() <= 254
