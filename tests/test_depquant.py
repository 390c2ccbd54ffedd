"""Dependent quantization: trellis levels must round-trip through the
dep-quant residual coder, beat RDOQ's measured RD cost on aggregate, and
survive a full encoder e2e with exact decoder recon match."""

import numpy as np
import pytest

from vvenc_tpu.ops import transforms as T
from vvenc_tpu.ops.depquant import depquant_np
from vvenc_tpu.ops.rdoq import rdoq_np
from vvenc_tpu.bitstream.cabac import (CtxModels, BitEstimator, CabacEncoder,
                                       CabacDecoder)
from vvenc_tpu.bitstream.bitwriter import BitWriter, BitReader
from vvenc_tpu.bitstream.residual import encode_residual, decode_residual


def _lambda(qp):
    return 0.57 * 2.0 ** ((qp - 12) / 3.0) * 16


def _rd_cost(resi, levels, qp, lm, ctx, dq):
    d = T.dequant_dq_np(levels, qp, 10) if dq else T.dequant_np(levels, qp, 10)
    rec = T.inv_transform_np(d, 10)
    dist = float(((resi - rec) ** 2).sum())
    if not np.any(levels):
        return dist
    est = BitEstimator(CtxModels(ctx))
    encode_residual(est, levels, True, dep_quant=dq)
    return dist + lm * est.get_bits()


@pytest.mark.parametrize("qp", [22, 32, 42])
def test_depquant_roundtrip_and_rd(qp):
    lm = _lambda(qp)
    tot_dq = tot_rdoq = 0.0
    for shape in ((4, 4), (8, 8), (32, 32), (4, 16), (16, 4), (2, 8),
                  (32, 8)):
        h, w = shape
        rng = np.random.RandomState(qp + h * 64 + w)
        ctx = CtxModels()
        ctx.init(min(qp, 51), 2)
        for trial in range(3):
            resi = (rng.randn(h, w) * (40 if trial < 2 else 200)).astype(
                np.int32)
            tc = T.fwd_transform_np(resi, 10)
            lv = depquant_np(tc, qp, 10, True, lm, ctx)
            tot_dq += _rd_cost(resi, lv, qp, lm, ctx, True)
            tot_rdoq += _rd_cost(resi, rdoq_np(tc, qp, 10, True, lm, ctx),
                                 qp, lm, ctx, False)
            if not np.any(lv):
                continue
            bw = BitWriter()
            enc = CabacEncoder(bw, CtxModels(ctx))
            enc.start()
            encode_residual(enc, lv, True, dep_quant=True)
            enc.encode_bin_trm(1)
            enc.finish()
            bw.align_zero()
            dec = CabacDecoder(BitReader(bw.get_bytes()), CtxModels(ctx))
            dec.start()
            assert np.array_equal(
                lv, decode_residual(dec, w, h, True, dep_quant=True))
    # the trellis should win on aggregate RD at every QP
    assert tot_dq < tot_rdoq


def test_depquant_encoder_e2e():
    from vvenc_tpu.encoder.intra_encoder import IntraEncoder, EncoderConfig
    from vvenc_tpu.decoder import decode_stream
    rng = np.random.RandomState(3)
    w, h = 128, 96
    base = rng.randint(0, 200, (h + 8, w + 8)).astype(np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    frames = []
    for i in range(3):
        y = base[i:i + h, i:i + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
        v = (128 - y[::2, ::2] // 3).astype(np.uint8)
        frames.append((y, u, v))
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=30, ctu_size=32,
                                     intra_period=0, gop_size=1,
                                     max_mtt_depth=1, dep_quant=True,
                                     deblocking=True))
    stream = enc.encode_sequence(frames)
    decoded = {f.poc: f for f in decode_stream(stream)}
    assert len(decoded) == 3
    for poc, rec in enc.recs_by_poc.items():
        for c in range(3):
            assert np.array_equal(np.asarray(rec[c]),
                                  np.asarray(decoded[poc].planes[c])), \
                f"poc {poc} comp {c}"
