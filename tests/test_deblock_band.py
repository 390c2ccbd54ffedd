"""Banded (per-CTU-row) deblocking must equal the monolithic pass.

The IFP-style frame pipeline (vvenc EncSlice CTU-task stages) filters
CTU row r as soon as its CUs are coded.  deblock_picture(y_band=...)
implements that banding; these tests pin its exactness on the richest
conformance stream (true preset medium RA: SBT/affine/SbTMVP/max-TB
edges, per-CU QP maps) by re-running the decoder with the deblock call
split into per-row banded calls over progressively coded CU lists.
"""

import os

import numpy as np
import pytest

from vvenc_tpu.codec import deblock as db
from vvenc_tpu.decoder.decoder import decode_stream

DATA = os.path.join(os.path.dirname(__file__), "data")


def _decode_with_banding(path, partial_lists):
    orig = db.deblock_picture

    def banded(rec, cu_list, *args, **kw):
        ctu = args[3]
        h = rec[0].shape[0]
        for y0 in range(0, h, ctu):
            if partial_lists:
                # only CUs coded so far (rows <= current band), as the
                # row pipeline would pass them
                cus = [cu for cu in cu_list if cu.y < y0 + ctu]
            else:
                cus = cu_list
            orig(rec, cus, *args, y_band=(y0, y0 + ctu), **kw)

    db.deblock_picture = banded
    try:
        frames = sorted(decode_stream(open(path, "rb").read()),
                        key=lambda fr: fr.poc)
    finally:
        db.deblock_picture = orig
    return frames


def test_batched_deblock_matches_sequential():
    """The vectorized batch kernel (ops/deblock_batch.py) must reproduce
    the sequential per-segment filter bit-exactly on the richest
    conformance stream (long filters, subblock CUs, SBT/max-TB edges,
    per-CU QP)."""
    path = os.path.join(DATA,
                        "golden_ra_preset_medium_416x240_qp30_f9.266")
    orig = db.deblock_picture

    def sequential(rec, cu_list, *args, **kw):
        kw["batch"] = False
        orig(rec, cu_list, *args, **kw)

    db.deblock_picture = sequential
    try:
        ref = sorted(decode_stream(open(path, "rb").read()),
                     key=lambda fr: fr.poc)
    finally:
        db.deblock_picture = orig
    batched = sorted(decode_stream(open(path, "rb").read()),
                     key=lambda fr: fr.poc)
    assert len(ref) == len(batched)
    for a, b in zip(ref, batched):
        for c in (0, 1, 2):
            assert np.array_equal(a.planes[c], b.planes[c]), \
                f"poc {a.poc} comp {c}"


@pytest.mark.parametrize("partial_lists", [False, True])
def test_banded_deblock_matches_monolithic(partial_lists):
    path = os.path.join(DATA,
                        "golden_ra_preset_medium_416x240_qp30_f9.266")
    ref = sorted(decode_stream(open(path, "rb").read()),
                 key=lambda fr: fr.poc)
    banded = _decode_with_banding(path, partial_lists)
    assert len(ref) == len(banded)
    for a, b in zip(ref, banded):
        for c in (0, 1, 2):
            assert np.array_equal(a.planes[c], b.planes[c]), \
                f"poc {a.poc} comp {c}"
