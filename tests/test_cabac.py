"""CABAC engine tests: probability model invariants + encode/decode round-trip."""

import random

import numpy as np
import pytest

from vvenc_tpu.bitstream.bitwriter import BitWriter, BitReader
from vvenc_tpu.bitstream.cabac import (
    CtxModels, CabacEncoder, CabacDecoder, BitEstimator,
    FRAC_BITS_TABLE, RENORM_TABLE_32, MASK_0, MASK_1)
from vvenc_tpu.bitstream.ctx_tables import NUM_CTX, CTX_SETS


def test_num_contexts_positive():
    assert NUM_CTX > 300  # full VVC context count
    # a few known set sizes (H.266 9.3.2.2 ordering)
    assert CTX_SETS["SplitFlag"].size == 9
    assert CTX_SETS["SigFlagLuma0"].size == 12
    assert CTX_SETS["ParFlagLuma"].size == 21
    assert CTX_SETS["LastXLuma"].size == 20


def test_frac_bits_table_known_values():
    # spot values from the normative estimator table
    # (vvenc Contexts.cpp:70 m_binFracBits)
    assert FRAC_BITS_TABLE[0, 0] == 0x0005C
    assert FRAC_BITS_TABLE[0, 1] == 0x48000
    assert FRAC_BITS_TABLE[255, 0] == 0x48000
    assert FRAC_BITS_TABLE[255, 1] == 0x0005C
    assert FRAC_BITS_TABLE[127, 0] == 0x07F48
    assert FRAC_BITS_TABLE[127, 1] == 0x080B9
    assert FRAC_BITS_TABLE[128, 0] == 0x080B9
    assert FRAC_BITS_TABLE[128, 1] == 0x07F48
    assert FRAC_BITS_TABLE[1, 0] == 0x00116
    assert FRAC_BITS_TABLE[1, 1] == 0x3B520


def test_renorm_table():
    assert list(RENORM_TABLE_32[:8]) == [6, 5, 4, 4, 3, 3, 3, 3]
    assert all(RENORM_TABLE_32[16:] == 1)


def test_ctx_init_states_in_range():
    for init_id in range(3):
        for qp in (0, 17, 32, 37, 51, 63):
            c = CtxModels()
            c.init(qp, init_id)
            s8 = (c.state0.astype(np.int32) + c.state1.astype(np.int32)) >> 8
            assert s8.min() >= 1 and s8.max() <= 255
            assert np.all((c.state0 & ~np.uint16(MASK_0)) == 0)
            assert np.all((c.state1 & ~np.uint16(MASK_1)) == 0)


def _roundtrip(events, qp=37, init_id=2):
    bw = BitWriter()
    enc = CabacEncoder(bw)
    enc.init_ctx(qp, init_id)
    for kind, *args in events:
        if kind == "bin":
            enc.encode_bin(args[0], args[1])
        elif kind == "ep":
            enc.encode_bin_ep(args[0])
        elif kind == "eps":
            enc.encode_bins_ep(args[0], args[1])
        elif kind == "rem":
            enc.encode_remabs_ep(*args)
        elif kind == "trm":
            enc.encode_bin_trm(args[0])
    enc.encode_bin_trm(1)
    enc.finish()
    bw.align_zero()

    dec = CabacDecoder(BitReader(bw.get_bytes()))
    dec.init_ctx(qp, init_id)
    out = []
    for kind, *args in events:
        if kind == "bin":
            out.append(("bin", dec.decode_bin(args[1]), args[1]))
        elif kind == "ep":
            out.append(("ep", dec.decode_bin_ep()))
        elif kind == "eps":
            out.append(("eps", dec.decode_bins_ep(args[1]), args[1]))
        elif kind == "rem":
            out.append(("rem", dec.decode_remabs_ep(args[1], args[2], args[3]),
                        *args[1:]))
        elif kind == "trm":
            out.append(("trm", dec.decode_bin_trm()))
    return out


def test_cabac_roundtrip_ctx_bins():
    rng = random.Random(11)
    events = [("bin", rng.randrange(2), rng.randrange(NUM_CTX))
              for _ in range(5000)]
    out = _roundtrip(events)
    for (k, b, c), (ko, bo, co) in zip(events, out):
        assert (k, b, c) == (ko, bo, co)


def test_cabac_roundtrip_mixed():
    rng = random.Random(23)
    events = []
    for _ in range(8000):
        r = rng.random()
        if r < 0.5:
            events.append(("bin", rng.randrange(2), rng.randrange(NUM_CTX)))
        elif r < 0.7:
            events.append(("ep", rng.randrange(2)))
        elif r < 0.9:
            n = rng.randrange(1, 17)
            events.append(("eps", rng.randrange(1 << n), n))
        else:
            rice = rng.randrange(0, 4)
            val = rng.randrange(0, 1 << rng.randrange(1, 14))
            events.append(("rem", val, rice, 5, 15))
    out = _roundtrip(events, qp=27, init_id=0)
    for ev, dec in zip(events, out):
        if ev[0] == "bin":
            assert dec[1] == ev[1]
        elif ev[0] == "ep":
            assert dec[1] == ev[1]
        elif ev[0] == "eps":
            assert dec[1] == ev[1]
        elif ev[0] == "rem":
            assert dec[1] == ev[1], (ev, dec)


def test_cabac_roundtrip_biased_bins():
    # heavily biased sources exercise renormalization + carry propagation
    rng = random.Random(5)
    events = []
    for _ in range(20000):
        ctx = rng.randrange(32)
        b = 1 if rng.random() < 0.02 else 0
        events.append(("bin", b, ctx))
    out = _roundtrip(events, qp=51, init_id=1)
    for ev, dec in zip(events, out):
        assert dec[1] == ev[1]


def test_cabac_remabs_escape_paths():
    # exercise the Exp-Golomb escape including very large values
    events = []
    for rice in range(4):
        for val in [0, 1, 5, 20, 100, 1000, 30000, (1 << 15) - 1]:
            events.append(("rem", val, rice, 5, 15))
    out = _roundtrip(events)
    for ev, dec in zip(events, out):
        assert dec[1] == ev[1], (ev, dec)


def test_bit_estimator_tracks_entropy():
    # estimator bits for a deterministic all-MPS run should be well below 1
    # bit/bin; for random bins about 1 bit/bin
    est = BitEstimator()
    est.ctx.init(37, 2)
    for _ in range(1000):
        est.encode_bin(0, 0)
    assert est.get_bits() < 300
    est2 = BitEstimator()
    est2.ctx.init(37, 2)
    rng = random.Random(2)
    for _ in range(1000):
        est2.encode_bin(rng.randrange(2), 0)
    assert 800 < est2.get_bits() < 1300


def test_encoder_decoder_state_sync():
    """After coding the same bins, enc and dec context states must match."""
    rng = random.Random(77)
    events = [("bin", rng.randrange(2), rng.randrange(NUM_CTX))
              for _ in range(3000)]
    bw = BitWriter()
    enc = CabacEncoder(bw)
    enc.init_ctx(30, 1)
    for _, b, c in events:
        enc.encode_bin(b, c)
    enc.encode_bin_trm(1)
    enc.finish()
    bw.align_zero()
    dec = CabacDecoder(BitReader(bw.get_bytes()))
    dec.init_ctx(30, 1)
    for _, b, c in events:
        dec.decode_bin(c)
    assert np.array_equal(enc.ctx.state0, dec.ctx.state0)
    assert np.array_equal(enc.ctx.state1, dec.ctx.state1)
