"""Inter-frame parallelism with CTU-line synchronization (IFP).

vvenc analog: EncGOP inter-frame parallel processing (vvencCfg m_ifp /
m_ifpLines; EncSlice CTU-task stages with reference-progress barriers).
A dependent picture may start once its references have FILTERED-FINAL
CTU rows covering the dependent row plus a fixed offset; motion is
restricted so no prediction ever reads beyond that window:

    accessible ref rows for CTU row r  =  (r + ifp_lines) * ctu

The restriction is purely a function of (row, ifp_lines) — never of
thread timing — so the bitstream is byte-identical for any worker
count (the reference's determinism contract), at a small BD-rate cost
exactly like vvenc's --ifp.

Filtered-final progress uses the banded deblocking proof
(codec/deblock.py y_band): after coding + banding CTU row r, rows
0..r-1 are final.  SAO/ALF derivations are whole-picture, so pictures
with SAO/ALF publish progress only on completion (the schedule still
runs; pipelining degenerates to frame waves).  LMCS model updates are
sequential across pictures and are not supported under IFP.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

# worst-case extra rows a motion-compensated read touches below
# y + h + int(mv): 4 interp taps + 2 DMVR integer refinement + 1 BDOF
# gradient border + 1 fractional-mv floor
MC_MARGIN = 8


class IfpProgress:
    """Shared filtered-row progress table for one parallel wave."""

    def __init__(self):
        self._rows: Dict[int, int] = {}
        self._cv = threading.Condition()
        self._error: Optional[BaseException] = None

    def register(self, poc: int, rows_final: int = 0) -> None:
        with self._cv:
            self._rows[poc] = rows_final
            self._cv.notify_all()

    def publish(self, poc: int, rows_final: int) -> None:
        with self._cv:
            if rows_final > self._rows.get(poc, -1):
                self._rows[poc] = rows_final
                self._cv.notify_all()

    def fail(self, exc: BaseException) -> None:
        with self._cv:
            self._error = exc
            self._cv.notify_all()

    def wait(self, poc: int, rows_needed: int) -> None:
        with self._cv:
            while self._rows.get(poc, 0) < rows_needed:
                if self._error is not None:
                    raise RuntimeError(
                        f"IFP peer failed: {self._error!r}")
                self._cv.wait(timeout=600)


class IfpPicture:
    """Per-picture IFP handle passed into _encode_picture.

    frec: the picture's FILTERED reconstruction planes, registered in
    the wave DPB before encoding starts (references read from it under
    the progress gate).  mf: pre-created motion field (TMVP source for
    dependents, gated by the same progress).
    """

    def __init__(self, progress: IfpProgress, poc: int, frec, mf,
                 ref_pocs: List[int], lines: int, n_rows: int):
        self.progress = progress
        self.poc = poc
        self.frec = frec
        self.mf = mf
        self.ref_pocs = ref_pocs
        self.lines = lines
        self.n_rows = n_rows

    def wait_refs(self, row: int) -> None:
        need = min(self.n_rows, row + self.lines)
        for rp in self.ref_pocs:
            self.progress.wait(rp, need)

    def publish(self, rows_final: int) -> None:
        self.progress.publish(self.poc, rows_final)


def mv_access_ok(cu_or_none, ifp_bottom: Optional[int], y: int, h: int,
                 mv_pair=None, ref_idx=None) -> bool:
    """True iff a trial's motion-compensated reads stay above the IFP
    window bottom.  Upward reads are always safe (rows grow downward).
    MC clamps out-of-picture reads to the last row, so the bound caps
    the read extent at the picture height implicitly: ifp_bottom equal
    to the picture height means no restriction (caller passes None)."""
    if ifp_bottom is None:
        return True
    cu = cu_or_none
    if cu is not None:
        y, h = cu.y, cu.h
        sub = getattr(cu, "sub_mi", None)
        if sub is not None:
            # per-sub-block ref gating too: GEO grids carry per-block
            # refs while the CU-level ref_idx stays unset
            mx = 0
            for row in sub:
                for mi in row:
                    for li in (0, 1):
                        if cu.ref_idx[li] >= 0 or mi.ref_idx[li] >= 0:
                            mx = max(mx, mi.mv[li][1])
            return y + h + (mx >> 4) + MC_MARGIN <= ifp_bottom
        if getattr(cu, "affine", False):
            # affine CU whose sub-block grid is not derived yet: the
            # interior MV field extrapolates beyond the control points,
            # so be conservative under restriction.  (CuData.cpmv is a
            # zero-filled tuple by default, so the gate must be the
            # affine flag — keying on cpmv rejected every plain
            # MMVD/SMVD/AMVR trial.)
            return False
        mv_pair, ref_idx = cu.mv, cu.ref_idx
    mx = 0
    for li in (0, 1):
        if ref_idx[li] >= 0:
            mx = max(mx, mv_pair[li][1])
    return y + h + (mx >> 4) + MC_MARGIN <= ifp_bottom
