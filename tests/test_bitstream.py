"""Bit-level I/O, Exp-Golomb, and NAL/EBSP tests."""

import random

import pytest

from vvenc_tpu.bitstream.bitwriter import BitWriter, BitReader
from vvenc_tpu.bitstream.nal import (
    NalUnitType, add_ebsp, strip_ebsp, make_nal_unit, split_annexb)


def test_bitwriter_basic():
    bw = BitWriter()
    bw.write(0b101, 3)
    bw.write(0b01, 2)
    bw.write(0b110, 3)
    assert bw.get_bytes() == bytes([0b10101110])


def test_bitwriter_reader_roundtrip():
    rng = random.Random(7)
    fields = [(rng.randrange(1 << n), n) for n in
              [rng.randrange(1, 33) for _ in range(500)]]
    bw = BitWriter()
    for v, n in fields:
        bw.write(v, n)
    bw.align_zero()
    br = BitReader(bw.get_bytes())
    for v, n in fields:
        assert br.read(n) == v


@pytest.mark.parametrize("value", [0, 1, 2, 3, 4, 7, 8, 255, 1023, 2**16, 2**30])
def test_uvlc_roundtrip(value):
    bw = BitWriter()
    bw.write_uvlc(value)
    bw.align_zero()
    assert BitReader(bw.get_bytes()).read_uvlc() == value


@pytest.mark.parametrize("value", [0, 1, -1, 2, -2, 17, -17, 2**15, -2**15])
def test_svlc_roundtrip(value):
    bw = BitWriter()
    bw.write_svlc(value)
    bw.align_zero()
    assert BitReader(bw.get_bytes()).read_svlc() == value


def test_uvlc_known_codes():
    # ue(v) code words per H.266 9.2: 0->'1', 1->'010', 2->'011', 3->'00100'
    for value, bits, nbits in [(0, 0b1, 1), (1, 0b010, 3), (2, 0b011, 3),
                               (3, 0b00100, 5), (4, 0b00101, 5)]:
        bw = BitWriter()
        bw.write_uvlc(value)
        assert bw.num_bits == nbits
        bw.align_zero()
        assert BitReader(bw.get_bytes()).read(nbits) == bits


def test_ebsp_escaping():
    rbsp = bytes([0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 4, 0, 0])
    ebsp = add_ebsp(rbsp)
    # every 00 00 must be followed by a byte > 3 or an inserted 03
    for i in range(len(ebsp) - 2):
        if ebsp[i] == 0 and ebsp[i + 1] == 0:
            assert ebsp[i + 2] > 3 or ebsp[i + 2] == 3
            if ebsp[i + 2] <= 3:
                assert ebsp[i + 2] == 3
    assert strip_ebsp(ebsp) == rbsp


def test_ebsp_random_roundtrip():
    rng = random.Random(3)
    for _ in range(200):
        rbsp = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in
                     range(rng.randrange(0, 64)))
        assert strip_ebsp(add_ebsp(rbsp)) == rbsp


def test_nal_split_annexb():
    sps = make_nal_unit(NalUnitType.SPS, b"\x12\x34\x00\x00\x00\x56")
    pps = make_nal_unit(NalUnitType.PPS, b"\x99", long_start_code=False)
    sl = make_nal_unit(NalUnitType.IDR_N_LP, bytes(range(40)), temporal_id=0)
    units = split_annexb(sps + pps + sl)
    assert [u[0] for u in units] == [
        NalUnitType.SPS, NalUnitType.PPS, NalUnitType.IDR_N_LP]
    assert units[0][2] == b"\x12\x34\x00\x00\x00\x56"
    assert units[1][2] == b"\x99"
    assert units[2][2] == bytes(range(40))
