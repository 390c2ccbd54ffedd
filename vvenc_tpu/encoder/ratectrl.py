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
                 gop_size: int = 1, stats: Optional[List[dict]] = None):
        self.target_bps = float(target_bps)
        self.fps = max(1e-6, float(fps))
        self.base_qp = base_qp
        self.gop_size = max(1, gop_size)
        self.frame_budget = self.target_bps / self.fps
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
        self.collected: List[dict] = []
        # lookahead complexities (encoder/lookahead.py; vvenc m_LookAhead):
        # {poc: complexity} for the window about to be coded
        self.la: Dict[int, float] = {}
        self._la_mean = 1.0

    def set_lookahead(self, complexities: Dict[int, float]) -> None:
        """Install the lookahead window's per-picture complexities."""
        self.la.update(complexities)
        vals = list(complexities.values())
        if vals:
            self._la_mean = max(1e-6, sum(vals) / len(vals))

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
        """QP for the picture about to be coded.

        base_pic_qp: the fixed-QP cascade value (slice QP incl. hierarchy
        offsets); the controller shifts the whole cascade."""
        if self.stats is not None:
            # two-pass: scale the whole sequence to the target, preserving
            # the pass-1 relative allocation (bits halve per +6 QP)
            target_total = self.target_bps / self.fps * len(self.stats)
            ratio = self.pass1_total / max(1.0, target_total)
            shift = 6.0 * math.log2(max(1e-6, ratio))
            # buffer feedback on top
            fb = 0.0
            if self.coded > 4:
                err = (self.spent - self.coded * self.frame_budget) \
                    / max(1.0, self.coded * self.frame_budget)
                fb = max(-3.0, min(3.0, 6.0 * err))
            return int(round(max(1, min(63, base_pic_qp + shift + fb))))
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
        return int(round(max(1, min(63, base_pic_qp + shift))))

    def update(self, poc: int, bits: int) -> None:
        self.spent += bits
        self.coded += 1
        if self.stats is None:
            # renormalize observed bits back to the base cascade
            norm = bits * 2.0 ** (self._last_shift / 6.0)
            a = 0.5 if self.coded < 8 else 0.15
            self.norm_ewma = norm if self.norm_ewma is None \
                else (1 - a) * self.norm_ewma + a * norm
            err = (self.spent - self.coded * self.frame_budget) \
                / max(1.0, self.frame_budget)
            self.delta = max(-6.0, min(6.0, 0.05 * err))

    @property
    def achieved_bps(self) -> float:
        return self.spent * self.fps / max(1, self.coded)
