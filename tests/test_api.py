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
