"""WPP wavefront CTU search (phase-1 parallel native search + serial
replay): worker-count byte-invariance, serial-search equivalence for
non-dqp configs, and decode round-trips."""
import numpy as np
import pytest

from vvenc_tpu import native
from vvenc_tpu.decoder import decode_stream
from vvenc_tpu.encoder import EncoderConfig, IntraEncoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _frames(w, h, n, seed=9):
    rng = np.random.RandomState(seed)
    out = []
    for t in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = np.clip(90 + 60 * np.sin((xx + 2.7 * t) / 6.5)
                    * np.cos((yy - 1.7 * t) / 5.5)
                    + rng.randn(h, w) * 5, 0, 255).astype(np.uint8)
        u = np.clip(120 + 10 * np.sin(xx / 9.0),
                    0, 255)[::2, ::2].astype(np.uint8)
        v = np.clip(130 + 12 * np.cos(yy / 11.0),
                    0, 255)[::2, ::2].astype(np.uint8)
        out.append((y, u, v))
    return out


def _encode(frames, w, h, workers, **kw):
    enc = IntraEncoder(EncoderConfig(width=w, height=h, wpp=True,
                                     wpp_search_workers=workers, **kw))
    return enc.encode_sequence(frames)


def test_wavefront_ai_matches_serial_any_workers():
    w, h, n = 192, 128, 3
    frames = _frames(w, h, n)
    kw = dict(qp=32, intra_period=1, ctu_size=64)
    outs = {wk: _encode(frames, w, h, wk, **kw) for wk in (-1, 1, 2, 3)}
    assert outs[1] == outs[2] == outs[3], "worker-count dependent stream"
    assert outs[-1] == outs[2], "wavefront != serial search (AI)"
    assert len(decode_stream(outs[2])) == n


def test_wavefront_inter_matches_serial():
    w, h, n = 192, 128, 5
    frames = _frames(w, h, n)
    kw = dict(qp=34, intra_period=16, gop_size=8, ctu_size=64,
              amvr=True, smvd=True, mmvd=True, geo=True, affine=True,
              sbtmvp=True, dmvr=True, bdof=True, dep_quant=True,
              lfnst=True, max_mtt_depth=1, mip=True, mrl=True, isp=True,
              jccr=True, cclm=True, mts_implicit=True, sao=True,
              deblocking=True, alf=True, ccalf=True)
    outs = {wk: _encode(frames, w, h, wk, **kw) for wk in (-1, 2, 3)}
    assert outs[2] == outs[3]
    assert outs[-1] == outs[2], "wavefront != serial search (inter)"
    assert len(decode_stream(outs[2])) == n


def test_wavefront_qpa_worker_invariant():
    """With QPA (cu_qp_delta on) the wavefront est chain prices the dqp
    as a single zero bin while the replay codes the real delta, so the
    stream legitimately differs from the serial-search escape hatch —
    but it must be worker-count invariant and decode."""
    w, h, n = 192, 128, 5
    frames = _frames(w, h, n)
    kw = dict(qp=34, intra_period=16, gop_size=8, ctu_size=64, qpa=1,
              mctf=True, bim=True, mmvd=True, dmvr=True, dep_quant=True,
              sao=True, deblocking=True, alf=True)
    outs = {wk: _encode(frames, w, h, wk, **kw) for wk in (1, 2, 3)}
    assert outs[1] == outs[2] == outs[3]
    assert len(decode_stream(outs[2])) == n
