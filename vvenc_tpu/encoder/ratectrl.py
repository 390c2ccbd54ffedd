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
        # real-first-pass window state (mini two-pass): predicted bits
        # per pending picture at the base QP, the learned half->full
        # scale corrections (log2, PER TEMPORAL LAYER — anchors and
        # high-TL pictures scale very differently), and applied shifts
        self.fp_win: Dict[int, tuple] = {}      # poc -> (pred_base, tl)
        # per-TL R(QP) model learned online (the vvenc R-lambda model
        # learns BOTH alpha and beta, RateCtrl updateAlphaBetaIntra):
        #   log2 bits = log2(pred_base) + scale - slope * shift / 6
        # scale: level correction; slope: QP sensitivity (1.0 = the
        # textbook bits-halve-per-+6QP; real content runs 1-4)
        self.fp_scale: Dict[int, float] = {}    # tl -> log2 level corr
        self.fp_slope: Dict[int, float] = {}    # tl -> model slope
        self._fp_seen: Dict[int, int] = {}      # tl -> updates observed
        self._fp_prev: Dict[int, tuple] = {}    # tl -> (shift, log2 l)
        self._fp_applied: Dict[int, float] = {}

    def set_lookahead(self, complexities: Dict[int, float],
                      pixels: Optional[int] = None,
                      fp_qp: int = 32, tls: Optional[Dict] = None) -> None:
        """Install the lookahead window's per-picture complexities.

        pixels: full-resolution pixel count when the complexities are
        REAL first-pass bits/px (encoder/lookahead.py first_pass_gop)
        — the window then runs as a mini two-pass below."""
        self.la.update(complexities)
        vals = list(complexities.values())
        if vals:
            self._la_mean = max(1e-6, sum(vals) / len(vals))
        if pixels and vals and self.stats is None:
            # REAL first-pass window (1-pass ABR): per-picture predicted
            # full-resolution bits at the base cascade QP.  The absolute
            # half-res -> full-res factor starts at the 0.33 empirical
            # prior and is LEARNED per sequence (log2-EWMA of
            # observed/predicted) — the window then behaves like the
            # two-pass controller over its own span
            # (vvenc RateCtrl processFirstPassData per-GOP budgets,
            # RateCtrl.cpp:201-202)
            for poc, c in complexities.items():
                tl = (tls or {}).get(poc, 0)
                self.fp_win[poc] = (c * float(pixels) * 0.33 *
                                    2.0 ** ((fp_qp - self.base_qp) / 6.0),
                                    tl)

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
        if poc in self.fp_win:
            # mini two-pass over the first-pass window: re-solve the QP
            # shift so the window's remaining predicted bits (with the
            # learned per-TL half->full scales) meet the remaining
            # budget, with a buffer-error catch-up spread over the window
            n_rem = max(1, len(self.fp_win))
            buf_err = self.spent - self.coded * self.frame_budget
            rem_budget = max(1.0, n_rem * self.frame_budget - buf_err)

            def pred_at(shift):
                return sum(
                    b * 2.0 ** (self.fp_scale.get(tl, 0.0)
                                - self.fp_slope.get(tl, 1.0) * shift / 6.0)
                    for b, tl in self.fp_win.values())
            # bisection on the monotone per-TL model (slopes differ per
            # TL, no closed form)
            lo_s, hi_s = -12.0, 12.0
            for _ in range(24):
                mid = 0.5 * (lo_s + hi_s)
                if pred_at(mid) > rem_budget:
                    lo_s = mid
                else:
                    hi_s = mid
            shift = 0.5 * (lo_s + hi_s)
            # asymmetric cold-start clamp: before the slope has been
            # observed, an "easy" prediction may be a half-res artifact
            # (downsampling halves the noise the full-res encode must
            # code) and the textbook -1/6 slope OVERDELIVERS bits below
            # the cascade — the learned slope lifts the restriction
            if self._fp_seen.get(0, 0) < 2:
                shift = max(-4.0, shift)
            shift = max(-12.0, min(12.0, shift))
            self._fp_applied[poc] = shift
            self._last_shift = shift
            qf = max(1.0, min(63.0, base_pic_qp + shift))
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
        if self.stats is None and poc in self.fp_win:
            # learn the per-TL half->full scale from observed/predicted
            # (log2-EWMA; tiny pictures carry no model information)
            pred_base, tl = self.fp_win.pop(poc)
            shift = self._fp_applied.pop(poc, 0.0)
            cur = self.fp_scale.get(tl, 0.0)
            slope = self.fp_slope.get(tl, 1.0)
            pred = pred_base * 2.0 ** (cur - slope * shift / 6.0)
            if pred_base >= 64 and bits >= 192:
                err = math.log2(max(1e-6, bits / pred))
                self.fp_scale[tl] = max(-6.0, min(6.0, cur + 0.5 * err))
                self._fp_seen[tl] = self._fp_seen.get(tl, 0) + 1
                # slope estimate from observation pairs at sufficiently
                # different operating points (>= 1.5 QP apart)
                lvl = math.log2(max(1.0, bits) / pred_base)
                prev = self._fp_prev.get(tl)
                if prev is not None and abs(prev[0] - shift) >= 1.5:
                    s_est = (lvl - prev[1]) * 6.0 / (prev[0] - shift)
                    if 0.3 <= s_est <= 6.0:
                        self.fp_slope[tl] = max(0.8, min(
                            5.0, 0.7 * slope + 0.3 * s_est))
                self._fp_prev[tl] = (shift, lvl)
            # keep the EWMA feedforward fresh for any non-window frames
            norm = bits * 2.0 ** (shift / 6.0)
            a = 0.5 if self.coded < 8 else 0.15
            self.norm_ewma = norm if self.norm_ewma is None \
                else (1 - a) * self.norm_ewma + a * norm
            return
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
