"""Rate control: single-pass ABR and two-pass VBR with a JSON stats file.

Structural analog of vvenc EncoderLib/RateCtrl.cpp (EncRCSeq/EncRCPic:101,
two-pass stats serialization :432-584, QP/lambda derivation
initRateControlPic): a R(QP) model with bits halving per +6 QP, per-GOP
budgeting with buffer feedback, and hierarchical QP offsets preserved from
the GOP cascade.

The stats file format is our own (JSON list of per-frame records), filling
the same role as vvenc's nlohmann-JSON stats (pass 1 -> pass 2 hand-off,
resumable as separate processes).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class FrameStat:
    poc: int
    qp: int
    bits: int
    slice_type: int
    temporal_level: int = 0


class RateCtrl:
    """Per-sequence rate control state.

    mode: 0 = off, 1 = single-pass ABR, 2 = two-pass (needs stats)."""

    def __init__(self, target_bps: float, fps: float, base_qp: int,
                 gop_size: int = 1, stats: Optional[List[dict]] = None,
                 max_bps: float = 0.0):
        self.target_bps = float(target_bps)
        self.fps = max(1e-6, float(fps))
        self.base_qp = base_qp
        self.gop_size = max(1, gop_size)
        self.frame_budget = self.target_bps / self.fps
        self.max_bps = float(max_bps)
        self.spent = 0.0
        self.coded = 0
        self.delta = 0.0            # integral QP corrector
        self.norm_ewma = None       # EWMA of bits renormalized to base QP
        self._last_shift = 0.0
        self.stats = stats
        self._stats_by_poc = {s["poc"]: s for s in stats} if stats else {}
        if stats:
            total = sum(s["bits"] for s in stats)
            self.pass1_total = max(1, total)
            # R(QP) model from pass 1: bits halve per +6 QP, so
            # alpha_f = bits1 * 2^(qp1/6) is a QP-invariant complexity;
            # predicted remaining bits at the pass-1 QPs drive the
            # per-GOP/remaining-budget allocation (EncRCPic analog)
            self._rem_pred = float(sum(max(1, s["bits"]) for s in stats))
            self._coded_pocs = set()
            # per-temporal-layer model correction (observed/predicted,
            # log2-EWMA) — RateCtrl's per-TL parameter update analog
            self._tl_corr: Dict[int, float] = {}
            self._applied: Dict[int, float] = {}
        self.collected: List[dict] = []
        # lookahead complexities (encoder/lookahead.py; vvenc m_LookAhead):
        # {poc: complexity} for the window about to be coded
        self.la: Dict[int, float] = {}
        self._la_mean = 1.0
        self._prev_prior = None     # last first-pass window level

    def set_lookahead(self, complexities: Dict[int, float],
                      pixels: Optional[int] = None,
                      fp_qp: int = 32) -> None:
        """Install the lookahead window's per-picture complexities.

        pixels: full-resolution pixel count when the complexities are
        REAL first-pass bits/px (encoder/lookahead.py first_pass_gop)
        — enables the absolute-level startup prior below."""
        self.la.update(complexities)
        vals = list(complexities.values())
        if vals:
            self._la_mean = max(1e-6, sum(vals) / len(vals))
        if pixels and vals and self.stats is None:
            # feedforward from the REAL first pass (1-pass ABR): the
            # half-res window encode knows the upcoming bits, so the
            # controller anticipates scene changes instead of EWMA-
            # lagging one GOP behind.  The prior is applied RELATIVELY
            # (scale the learned level by the predicted window-to-window
            # change) — the absolute half-res -> full-res bits factor is
            # content-dependent, but its RATIO across windows cancels.
            pred = (sum(vals) / len(vals)) * float(pixels) * 0.33
            prior = pred * 2.0 ** ((fp_qp - self.base_qp) / 6.0)
            if self.norm_ewma is None:
                self.norm_ewma = prior  # absolute startup guess
            elif self._prev_prior:
                self.norm_ewma *= prior / self._prev_prior
            self._prev_prior = prior

    def _la_shift(self, poc: int) -> float:
        """Per-picture QP offset from the lookahead complexity ratio
        (bits ~ complexity at fixed QP; allocation ~ sqrt(complexity))."""
        c = self.la.get(poc)
        if c is None:
            return 0.0
        return max(-4.0, min(4.0, 3.0 * math.log2(c / self._la_mean)))

    # -- pass-1 collection --------------------------------------------------
    def add_stat(self, poc: int, qp: int, bits: int, slice_type: int,
                 tl: int = 0) -> None:
        self.collected.append(dict(poc=poc, qp=qp, bits=bits,
                                   slice_type=slice_type, tl=tl))

    def write_stats(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"version": 1, "frames": self.collected}, f)

    @staticmethod
    def read_stats(path: str) -> List[dict]:
        with open(path) as f:
            d = json.load(f)
        return d["frames"]

    # -- QP decisions ---------------------------------------------------------
    def pic_qp(self, poc: int, base_pic_qp: int, num_frames: int) -> int:
        """Integer QP for the picture about to be coded (signalled)."""
        return self.pic_qp_lambda(poc, base_pic_qp, num_frames)[0]

    def pic_qp_lambda(self, poc: int, base_pic_qp: int, num_frames: int):
        """(int_qp, fractional_qp) for the picture about to be coded —
        the fractional value drives the RD lambda (the reference keeps
        picInitialQP and picInitialLambda separate so lambda tracks the
        model exactly while the signalled QP rounds,
        RateCtrl.cpp:1175 initRateControlPic / estimatePicLambda).

        base_pic_qp: the fixed-QP cascade value (slice QP incl. hierarchy
        offsets); the controller shifts the whole cascade."""
        if self.stats is not None:
            # two-pass R(QP) model: the remaining budget is distributed
            # over the remaining pictures proportionally to their pass-1
            # complexity (predicted bits at the pass-1 QPs), i.e. the QP
            # shift re-solves Σ bits1_f·2^(-shift/6) = remaining_budget
            # after every coded picture — scene cuts reallocate naturally
            # because their pass-1 bits spike (processFirstPassData analog)
            target_total = self.target_bps / self.fps * len(self.stats)
            rem_budget = max(1.0, target_total - self.spent)
            rem_pred = max(1.0, self._rem_pred)
            shift = 6.0 * math.log2(rem_pred / rem_budget)
            shift = max(-12.0, min(12.0, shift))
            st = self._stats_by_poc.get(poc)
            tl = st.get("tl", 0) if st else 0
            corr = self._tl_corr.get(tl, 0.0)
            qp = base_pic_qp + shift + 6.0 * corr
            # max-rate cap: clamp the picture's predicted bits to a burst
            # window of the max rate (vvenc rate-cap, RateCtrl.cpp:432+)
            if self.max_bps > 0 and st is not None:
                cap = 4.0 * self.max_bps / self.fps
                pred = st["bits"] * 2.0 ** (-(qp - st["qp"]) / 6.0)
                if pred > cap:
                    qp = st["qp"] + 6.0 * math.log2(st["bits"] / cap)
            self._applied[poc] = qp - base_pic_qp
            qf = max(1.0, min(63.0, qp))
            return int(round(qf)), qf
        # single-pass ABR: model feedforward (R halves per +6 QP) on an
        # EWMA of bits renormalized to the base cascade, plus an integral
        # trim on the cumulative buffer error.
        ff = 0.0
        if self.norm_ewma is not None:
            ff = 6.0 * math.log2(max(1e-6, self.norm_ewma
                                     / self.frame_budget))
        shift = max(-12.0, min(12.0, ff + self.delta)) \
            + self._la_shift(poc)
        self._last_shift = shift
        qf = max(1.0, min(63.0, base_pic_qp + shift))
        return int(round(qf)), qf

    def update(self, poc: int, bits: int) -> None:
        self.spent += bits
        self.coded += 1
        if self.stats is not None:
            st = self._stats_by_poc.get(poc)
            if st is not None and poc not in self._coded_pocs:
                self._coded_pocs.add(poc)
                self._rem_pred -= max(1, st["bits"])
                # per-TL model correction: log2(actual / predicted) EWMA
                shift_applied = self._applied.get(poc, 0.0)
                pred = max(1.0, st["bits"] * 2.0 ** (-shift_applied / 6.0))
                tl = st.get("tl", 0)
                # model-parameter update, weighted by picture size: tiny
                # pictures (headers dominate) carry no model information
                # and would otherwise swing the correction wildly
                if pred >= 2048:
                    err = math.log2(max(1e-6, bits / pred))
                    prev = self._tl_corr.get(tl, 0.0)
                    upd = 0.75 * prev + 0.25 * err
                    self._tl_corr[tl] = max(-0.5, min(0.5, upd))
            return
        if self.stats is None:
            # renormalize observed bits back to the base cascade
            norm = bits * 2.0 ** (self._last_shift / 6.0)
            a = 0.5 if self.coded < 8 else 0.15
            self.norm_ewma = norm if self.norm_ewma is None \
                else (1 - a) * self.norm_ewma + a * norm
            err = (self.spent - self.coded * self.frame_budget) \
                / max(1.0, self.frame_budget)
            # integral gain 0.2: the old 0.05 left ~40% rate error on
            # 1-second clips (the 2^(dQP/6) model under-corrects at low
            # QPs); the EWMA feedforward keeps the loop stable
            self.delta = max(-8.0, min(8.0, 0.2 * err))

    @property
    def achieved_bps(self) -> float:
        return self.spent * self.fps / max(1, self.coded)
