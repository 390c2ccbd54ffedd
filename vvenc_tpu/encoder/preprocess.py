"""Pre-processing stage: GOP-input analysis before encoding.

Structural analog of vvenc EncoderLib/PreProcess.{h,cpp} (processPictures
:102): per input picture we compute

- spatial + temporal **visual activity** (``xGetVisualActivity``,
  PreProcess.h:94) — the same high-pass energies the QPA/XPSNR model uses
  (shared with encoder/qpa.py);
- **STA / scene-change detection** (``xDetectSTA``, PreProcess.h:97): a
  picture whose temporal activity jumps by more than a ratio threshold
  against the running level starts a new scene → the GOP scheduler can
  force an IDR / the rate control resets its model there;
- **SCC (screen content) detection** (``xDetectScc``, PreProcess.h:98):
  block-wise "few distinct sample values + sharp edges" statistics decide
  whether screen-content tools (IBC/TS/BDPCM) should be enabled.

All detectors work on the 8-bit/10-bit original luma plane only, like the
reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .qpa import _spatial_hp_map, _temporal_hp_map


@dataclass
class FrameAnalysis:
    poc: int
    spatial_act: float          # mean |4-neighbour high-pass| energy
    temporal_act: float         # mean |temporal high-pass| energy
    is_scene_cut: bool = False
    is_scc: bool = False


def picture_visual_activity(y: np.ndarray, prev1: Optional[np.ndarray],
                            prev2: Optional[np.ndarray],
                            frame_rate: int = 30):
    """(spatial, temporal) mean visual activity of one picture."""
    sp = float(np.mean(_spatial_hp_map(y.astype(np.int32))))
    if prev1 is None:
        tp = 0.0
    else:
        tm = _temporal_hp_map(y.astype(np.int32),
                              prev1.astype(np.int32),
                              prev2.astype(np.int32)
                              if prev2 is not None else None, frame_rate)
        tp = float(np.mean(tm))
    return sp, tp


def detect_scene_cut(temporal_act: float, running_level: float,
                     min_act: float = 50.0, ratio: float = 6.0) -> bool:
    """STA detector: temporal activity must exceed ``ratio`` x the running
    level (and an absolute floor) to flag a new scene (vvenc xDetectSTA
    uses a picVisActTL0 ratio test, PreProcess.cpp)."""
    if temporal_act < min_act:
        return False
    return temporal_act > ratio * max(running_level, 1e-6)


def detect_scc(y: np.ndarray, block: int = 4) -> bool:
    """Screen-content detector on the luma plane.

    vvenc xDetectScc hashes 4x4 blocks and counts (a) blocks with very few
    distinct sample values and (b) sharp horizontal/vertical edges.  Here:
    a block votes SCC if it has <= 2 distinct values or contains a
    full-amplitude step edge; the picture is SCC if >30% of blocks vote."""
    h, w = y.shape
    hb, wb = h // block, w // block
    if hb == 0 or wb == 0:
        return False
    v = y[:hb * block, :wb * block].reshape(hb, block, wb, block)
    v = v.transpose(0, 2, 1, 3).reshape(hb * wb, block * block)
    rng = v.max(axis=1).astype(np.int32) - v.min(axis=1).astype(np.int32)
    srt = np.sort(v, axis=1).astype(np.int32)
    diffs = np.diff(srt, axis=1)
    n_distinct = 1 + (diffs > 0).sum(axis=1)
    few_vals = n_distinct <= 2
    sharp = (rng > 40) & (n_distinct <= 4)
    votes = few_vals | sharp
    return float(votes.mean()) > 0.30


class PreProcess:
    """Streaming analyzer: feed pictures in display order, read back
    per-frame analysis (visual activity, scene cuts, SCC)."""

    def __init__(self, frame_rate: int = 30, bit_depth: int = 8):
        self.frame_rate = max(1, frame_rate)
        self.results: List[FrameAnalysis] = []
        self._prev = None
        self._prev2 = None
        self._temp_level = None      # running (EWMA) temporal activity
        self._scc_votes: List[bool] = []

    def push(self, y: np.ndarray) -> FrameAnalysis:
        poc = len(self.results)
        sp, tp = picture_visual_activity(y, self._prev, self._prev2,
                                         self.frame_rate)
        cut = False
        if self._prev is not None:
            cut = detect_scene_cut(tp, self._temp_level
                                   if self._temp_level is not None else tp)
        if self._temp_level is None:
            self._temp_level = tp
        elif not cut:
            self._temp_level = 0.75 * self._temp_level + 0.25 * tp
        else:
            self._temp_level = tp    # reset the model at the cut
        fa = FrameAnalysis(poc, sp, tp, is_scene_cut=cut,
                           is_scc=detect_scc(y))
        self.results.append(fa)
        self._prev2 = self._prev
        self._prev = y
        return fa

    def sequence_is_scc(self) -> bool:
        """Majority vote over the analyzed frames (vvenc keeps a per-GOP
        SCC decision; sequence-level is the round-1 granularity)."""
        if not self.results:
            return False
        return (sum(1 for r in self.results if r.is_scc)
                > len(self.results) / 2)
