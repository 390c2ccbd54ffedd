"""Rate-control lookahead (vvenc m_LookAhead analog).

vvenc's --LookAhead runs the rate-control pre-analysis one GOP ahead of
the encoder inside a single pass (EncoderLib/EncGOP look-ahead staging,
vvencCfg m_LookAhead), replacing the separate first pass: per-picture
complexity estimates drive the bit allocation before each picture is
coded.

Our analog estimates a per-picture complexity from the same hierarchical
block ME the MCTF stage uses (encoder/mctf.py motion_estimate):

  intra pictures: mean spatial gradient (no reference available)
  inter pictures: mean motion-compensated SAD against the nearest
                  reference in coding order

RateCtrl converts the complexity RATIO within the lookahead window into
a per-picture QP offset on top of its feedback loop: at a fixed QP,
bits scale roughly linearly with complexity, while the R-lambda
allocation gives a complex picture only ~sqrt more bits, so

  dQP(poc) = 3 * log2(c_poc / mean_c)        (clamped)

matching the classic complexity^0.5 bit split (bits halve per +6 QP).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _spatial_activity(y: np.ndarray) -> float:
    """Mean absolute gradient — intra complexity proxy."""
    gx = np.abs(np.diff(y.astype(np.int32), axis=1)).mean()
    gy = np.abs(np.diff(y.astype(np.int32), axis=0)).mean()
    return float(gx + gy) + 1e-3


def _inter_complexity(cur: np.ndarray, ref: np.ndarray) -> float:
    """Mean motion-compensated SAD per pixel (16x16 hierarchical ME);
    small pictures (where the 3-level pyramid degenerates) fall back to
    the zero-motion frame difference."""
    if min(cur.shape) >= 128:
        from .mctf import motion_estimate
        _, err = motion_estimate(cur.astype(np.float32),
                                 ref.astype(np.float32))
        return float(np.mean(err)) / 256.0 + 1e-3
    d = np.abs(cur.astype(np.int32) - ref.astype(np.int32))
    return float(d.mean()) + 1e-3


def _half(p):
    """2x2 mean downsample (even-cropped)."""
    h, w = p.shape[0] & ~1, p.shape[1] & ~1
    q = p[:h, :w].astype(np.int32)
    return ((q[0::2, 0::2] + q[1::2, 0::2] + q[0::2, 1::2]
             + q[1::2, 1::2] + 2) >> 2).astype(p.dtype)


def first_pass_gop(frames: List, base: int, entries, cfg
                   ) -> Dict[int, float]:
    """REAL first pass for one GOP window (vvenc EncLib.cpp:356-366
    LookAhead stage with the FIRSTPASS preset + FirstPassMode=2
    half-resolution): encode frames[base .. base+gop] at half res with
    the firstpass tool set at a fixed QP and return each picture's
    actual coded bits as its complexity.  Falls back to the SAD proxy
    (analyze_gop) for pictures too small to halve.

    Returns (complexities, is_real): is_real marks bits/px units
    (the absolute-level RC prior applies only then)."""
    if min(frames[0][0].shape) < 128:
        return analyze_gop(frames, base, entries), False
    from .intra_encoder import EncoderConfig, IntraEncoder
    last = max(e.poc_in_gop for e in entries)
    hi = min(len(frames), base + last + 1)
    # one LEAD frame when the window is mid-sequence: the window anchor
    # then codes at its actual slice type (P/B against the lead IDR)
    # instead of as an unrepresentative IDR whose bits had to be dropped
    # — scene-cut anchors (the costliest pictures) get real first-pass
    # bits this way (vvenc EncLib.cpp:356-366 feeds stats for EVERY
    # picture; VERDICT r4 item 6)
    lo = base - 1 if base > 0 else base
    window = [tuple(_half(p) for p in frames[i]) for i in range(lo, hi)]
    if len(window) < 2:
        return analyze_gop(frames, base, entries), False
    fp_cfg = EncoderConfig(
        width=window[0][0].shape[1], height=window[0][0].shape[0],
        qp=32, gop_size=cfg.gop_size, intra_period=0,
        ctu_size=64, deblocking=True, mctf=False,
        num_full_rd_modes=1, num_chroma_rd_modes=1,
        input_bit_depth=cfg.input_bit_depth)
    enc = IntraEncoder(fp_cfg)
    enc.encode_sequence(window)
    px = float(window[0][0].size)
    out: Dict[int, float] = {}
    for rel, bits in enc.bits_by_poc.items():
        poc = lo + rel
        if rel == 0 and lo > 0:
            continue  # lead frame coded as IDR; not representative
        if poc < base:
            continue  # the lead belongs to the previous window
        out[poc] = float(bits) / px + 1e-3
    if not out:
        return analyze_gop(frames, base, entries), False
    return out, True


def analyze_gop(frames: List, base: int, entries) -> Dict[int, float]:
    """Lookahead complexities for one GOP about to be coded.

    frames: full sequence of (Y, U, V); entries: gop.build_gop entries
    (coding order).  Returns {poc: complexity}."""
    out: Dict[int, float] = {}
    for e in entries:
        poc = base + e.poc_in_gop
        if poc >= len(frames):
            continue
        refs = [base + r for r in e.refs_past] or [base]
        refs += [base + r for r in e.refs_future]
        ref = min(refs, key=lambda r: abs(r - poc))
        out[poc] = _inter_complexity(frames[poc][0], frames[ref][0])
    return out


def analyze_intra(frames: List) -> Dict[int, float]:
    """Lookahead complexities for an all-intra sequence."""
    return {i: _spatial_activity(f[0]) for i, f in enumerate(frames)}
