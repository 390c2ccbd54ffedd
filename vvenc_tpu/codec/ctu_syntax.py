"""Coding-tree / CU / TU syntax (encode + decode) with reconstruction.

Implements H.266 7.3.11.2-7.3.11.10 for the round-1 tool set: QT-only
partitioning (MTT hooks pending), intra CUs, single tree, TU == CU
(max TB 32), regular residual coding.

Behavioral reference: vvenc EncoderLib/CABACWriter.cpp (coding_tree_unit:156,
split_cu_mode:563, coding_unit:641, intra_luma_pred_modes:955,
intra_chroma_pred_mode:1178, transform_unit:2032, cbf_comp:1943),
CommonLib/UnitTools.cpp (getIntraMPMs:544, getIntraChromaCandModes:677),
CommonLib/ContextModelling.cpp (CtxSplit:147).

Both paths share the derivation helpers so encoder and decoder cannot
diverge; the decoder additionally reconstructs into the PictureState.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream import ctx_tables as ct
from ..bitstream.residual import encode_residual, decode_residual
from ..ops import intra as I
from ..ops import transforms as T
from .picture import PictureState
from .qp import QpState

PLANAR, DC, HOR, VER, VDIA = I.PLANAR_IDX, I.DC_IDX, I.HOR_IDX, I.VER_IDX, I.VDIA_IDX
NUM_LUMA_MODE = I.NUM_LUMA_MODE
DM_CHROMA = 67  # sentinel: derived mode
NUM_MPM = 6


# ---------------------------------------------------------------------------
# decision tree data model
# ---------------------------------------------------------------------------

@dataclass
class CuData:
    x: int
    y: int
    w: int
    h: int
    luma_mode: int = PLANAR
    chroma_dir: int = DM_CHROMA      # signalled chroma mode (DM or mode value)
    coeff_y: Optional[np.ndarray] = None
    coeff_cb: Optional[np.ndarray] = None
    coeff_cr: Optional[np.ndarray] = None


@dataclass
class TreeNode:
    x: int
    y: int
    size: int
    qt_depth: int
    split: bool = False
    children: List["TreeNode"] = field(default_factory=list)
    cu: Optional[CuData] = None


# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

def split_options(ps: PictureState, x: int, y: int, size: int, min_qt: int):
    """(can_no, can_qt) for a QT-only tree with implicit boundary splits."""
    inside = (x + size <= ps.w) and (y + size <= ps.h)
    can_qt = size > min_qt
    return inside, can_qt


def split_flag_ctx(ps: PictureState, x: int, y: int, size: int) -> int:
    ctx = 0
    left = ps.cu_at(x - 1, y)
    above = ps.cu_at(x, y - 1)
    if left is not None:
        ctx += 1 if left[1] < size else 0   # neighbor height < current
    if above is not None:
        ctx += 1 if above[0] < size else 0  # neighbor width < current
    # QT-only: numSplit = 2 -> (numSplit-1)>>1 = 0 contribution
    return ctx


def get_intra_mpms(ps: PictureState, x: int, y: int, w: int, h: int,
                   ctu_size: int) -> list:
    """6-entry MPM list (vvenc CU::getIntraMPMs:544)."""
    left_dir = above_dir = PLANAR
    lc = ps.cu_at(x - 1, y + h - 1)
    if lc is not None and lc[4] and not lc[5]:
        left_dir = lc[3]
    # above only from the same CTU row: top edge not on a CTU boundary
    if (y % ctu_size) != 0:
        ac = ps.cu_at(x + w - 1, y - 1)
        if ac is not None and ac[4] and not ac[5]:
            above_dir = ac[3]
    offset = NUM_LUMA_MODE - 6  # 61
    mod = offset + 3            # 64
    mpm = [PLANAR, DC, VER, HOR, VER - 4, VER + 4]
    if left_dir == above_dir:
        if left_dir > DC:
            mpm = [PLANAR, left_dir,
                   ((left_dir + offset) % mod) + 2,
                   ((left_dir - 1) % mod) + 2,
                   ((left_dir + offset - 1) % mod) + 2,
                   (left_dir % mod) + 2]
    else:
        if left_dir > DC and above_dir > DC:
            mpm = [PLANAR, left_dir, above_dir, 0, 0, 0]
            mx = max(left_dir, above_dir)
            mn = min(left_dir, above_dir)
            if mx - mn == 1:
                mpm[3] = ((mn + offset) % mod) + 2
                mpm[4] = ((mx - 1) % mod) + 2
                mpm[5] = ((mn + offset - 1) % mod) + 2
            elif mx - mn >= 62:
                mpm[3] = ((mn - 1) % mod) + 2
                mpm[4] = ((mx + offset) % mod) + 2
                mpm[5] = (mn % mod) + 2
            elif mx - mn == 2:
                mpm[3] = ((mn - 1) % mod) + 2
                mpm[4] = ((mn + offset) % mod) + 2
                mpm[5] = ((mx - 1) % mod) + 2
            else:
                mpm[3] = ((mn + offset) % mod) + 2
                mpm[4] = ((mn - 1) % mod) + 2
                mpm[5] = ((mx + offset) % mod) + 2
        elif left_dir + above_dir >= 2:
            md = max(left_dir, above_dir)
            mpm = [PLANAR, md,
                   ((md + offset) % mod) + 2,
                   ((md - 1) % mod) + 2,
                   ((md + offset - 1) % mod) + 2,
                   (md % mod) + 2]
    return mpm


def chroma_cand_modes(luma_mode: int) -> list:
    """4 signalled chroma candidates with VDIA substitution (UnitTools:677)."""
    modes = [PLANAR, VER, HOR, DC]
    for i in range(4):
        if modes[i] == luma_mode:
            modes[i] = VDIA
            break
    return modes


_TB_MAX = [0] * 257
for _i in range(1, 257):
    _TB_MAX[_i] = (_i).bit_length() - 1


def write_trunc_bin(enc, symbol: int, max_symbol: int) -> None:
    thresh = _TB_MAX[max_symbol]
    val = 1 << thresh
    b = max_symbol - val
    if symbol < val - b:
        enc.encode_bins_ep(symbol, thresh)
    else:
        symbol += val - b
        enc.encode_bins_ep(symbol >> 1, thresh)
        enc.encode_bin_ep(symbol & 1)


def read_trunc_bin(dec, max_symbol: int) -> int:
    thresh = _TB_MAX[max_symbol]
    val = 1 << thresh
    b = max_symbol - val
    v = dec.decode_bins_ep(thresh) if thresh else 0
    if v >= val - b:
        v = (v << 1) | dec.decode_bin_ep()
        v -= val - b
    return v


# ---------------------------------------------------------------------------
# encode path
# ---------------------------------------------------------------------------

class SyntaxCoder:
    """Encodes/decodes one slice's CTU stream.  Holds slice-level params."""

    def __init__(self, sps, pps, sh, qp_state: QpState):
        self.sps = sps
        self.pps = pps
        self.sh = sh
        self.qp = qp_state
        self.ctu_size = sps.ctu_size
        self.min_qt = sps.min_qt_size[0]
        self.bit_depth = sps.bit_depth

    # -- encoding ----------------------------------------------------------
    def encode_ctu(self, enc, ps: PictureState, node: TreeNode) -> None:
        """Encode one CTU's coding tree; reconstructs into ps as it goes
        (the encoder relies on ps for neighbor-dependent syntax)."""
        self._enc_tree(enc, ps, node)

    def _enc_tree(self, enc, ps, node: TreeNode) -> None:
        x, y, size = node.x, node.y, node.size
        can_no, can_qt = split_options(ps, x, y, size, self.min_qt)
        if can_no and can_qt:
            ctx = split_flag_ctx(ps, x, y, size)
            enc.encode_bin(1 if node.split else 0, ct.CTX_SETS["SplitFlag"](ctx))
        elif not can_no:
            assert node.split, "implicit split required at picture boundary"
        else:
            assert not node.split, "split below min QT size"
        if node.split:
            half = size >> 1
            for child in node.children:
                if child.x >= ps.w or child.y >= ps.h:
                    continue
                self._enc_tree(enc, ps, child)
        else:
            self._enc_cu(enc, ps, node)

    def _enc_cu(self, enc, ps, node: TreeNode) -> None:
        cu = node.cu
        w = min(node.size, ps.w - node.x)
        h = min(node.size, ps.h - node.y)
        assert (w, h) == (cu.w, cu.h), (w, h, cu.w, cu.h)
        self._enc_intra_luma_mode(enc, ps, cu)
        self._enc_intra_chroma_mode(enc, cu)
        # transform unit (TU == CU): cbf cb, cr, luma, then residuals
        cbf_cb = cu.coeff_cb is not None and np.any(cu.coeff_cb)
        cbf_cr = cu.coeff_cr is not None and np.any(cu.coeff_cr)
        cbf_y = cu.coeff_y is not None and np.any(cu.coeff_y)
        enc.encode_bin(1 if cbf_cb else 0, ct.CTX_SETS["QtCbfCb"](0))
        enc.encode_bin(1 if cbf_cr else 0,
                       ct.CTX_SETS["QtCbfCr"](1 if cbf_cb else 0))
        enc.encode_bin(1 if cbf_y else 0, ct.CTX_SETS["QtCbfLuma"](0))
        if cbf_y:
            encode_residual(enc, cu.coeff_y, True)
        if cbf_cb:
            encode_residual(enc, cu.coeff_cb, False)
        if cbf_cr:
            encode_residual(enc, cu.coeff_cr, False)
        # reconstruct so subsequent syntax sees correct neighbor state
        reconstruct_cu(ps, cu, self.qp, node.qt_depth, self.bit_depth)

    def _enc_intra_luma_mode(self, enc, ps, cu: CuData) -> None:
        mpm = get_intra_mpms(ps, cu.x, cu.y, cu.w, cu.h, self.ctu_size)
        mode = cu.luma_mode
        mpm_idx = mpm.index(mode) if mode in mpm else NUM_MPM
        enc.encode_bin(1 if mpm_idx < NUM_MPM else 0,
                       ct.CTX_SETS["IntraLumaMpmFlag"](0))
        if mpm_idx < NUM_MPM:
            enc.encode_bin(1 if mpm_idx > 0 else 0,
                           ct.CTX_SETS["IntraLumaPlanarFlag"](1))
            if mpm_idx:
                enc.encode_bin_ep(1 if mpm_idx > 1 else 0)
            if mpm_idx > 1:
                enc.encode_bin_ep(1 if mpm_idx > 2 else 0)
            if mpm_idx > 2:
                enc.encode_bin_ep(1 if mpm_idx > 3 else 0)
            if mpm_idx > 3:
                enc.encode_bin_ep(1 if mpm_idx > 4 else 0)
        else:
            srt = sorted(mpm)
            m = mode
            for v in reversed(srt):
                if m > v:
                    m -= 1
            write_trunc_bin(enc, m, NUM_LUMA_MODE - NUM_MPM)

    def _enc_intra_chroma_mode(self, enc, cu: CuData) -> None:
        assert not self.sps.cclm
        is_dm = cu.chroma_dir == DM_CHROMA
        enc.encode_bin(0 if is_dm else 1, ct.CTX_SETS["IntraChromaPredMode"](0))
        if not is_dm:
            cands = chroma_cand_modes(cu.luma_mode)
            cand_id = cands.index(cu.chroma_dir)
            enc.encode_bins_ep(cand_id, 2)

    # -- decoding ----------------------------------------------------------
    def decode_ctu(self, dec, ps: PictureState, ctu_x: int, ctu_y: int) -> TreeNode:
        return self._dec_tree(dec, ps, ctu_x, ctu_y, self.ctu_size, 0)

    def _dec_tree(self, dec, ps, x, y, size, qt_depth) -> TreeNode:
        node = TreeNode(x, y, size, qt_depth)
        can_no, can_qt = split_options(ps, x, y, size, self.min_qt)
        if can_no and can_qt:
            ctx = split_flag_ctx(ps, x, y, size)
            node.split = bool(dec.decode_bin(ct.CTX_SETS["SplitFlag"](ctx)))
        elif not can_no:
            assert can_qt, "cannot represent boundary block"
            node.split = True
        else:
            node.split = False
        if node.split:
            half = size >> 1
            for (cx, cy) in ((x, y), (x + half, y), (x, y + half),
                             (x + half, y + half)):
                if cx >= ps.w or cy >= ps.h:
                    continue
                node.children.append(
                    self._dec_tree(dec, ps, cx, cy, half, qt_depth + 1))
        else:
            node.cu = self._dec_cu(dec, ps, node)
        return node

    def _dec_cu(self, dec, ps, node: TreeNode) -> CuData:
        x, y, size = node.x, node.y, node.size
        w = min(size, ps.w - x)
        h = min(size, ps.h - y)
        cu = CuData(x, y, w, h)
        cu.luma_mode = self._dec_intra_luma_mode(dec, ps, cu)
        cu.chroma_dir = self._dec_intra_chroma_mode(dec, cu)
        cbf_cb = dec.decode_bin(ct.CTX_SETS["QtCbfCb"](0))
        cbf_cr = dec.decode_bin(ct.CTX_SETS["QtCbfCr"](1 if cbf_cb else 0))
        cbf_y = dec.decode_bin(ct.CTX_SETS["QtCbfLuma"](0))
        if cbf_y:
            cu.coeff_y = decode_residual(dec, w, h, True)
        if cbf_cb:
            cu.coeff_cb = decode_residual(dec, w >> 1, h >> 1, False)
        if cbf_cr:
            cu.coeff_cr = decode_residual(dec, w >> 1, h >> 1, False)
        reconstruct_cu(ps, cu, self.qp, node.qt_depth, self.bit_depth)
        return cu

    def _dec_intra_luma_mode(self, dec, ps, cu: CuData) -> int:
        mpm = get_intra_mpms(ps, cu.x, cu.y, cu.w, cu.h, self.ctu_size)
        if dec.decode_bin(ct.CTX_SETS["IntraLumaMpmFlag"](0)):
            if not dec.decode_bin(ct.CTX_SETS["IntraLumaPlanarFlag"](1)):
                return mpm[0]
            idx = 1
            while idx < NUM_MPM - 1 and dec.decode_bin_ep():
                idx += 1
            return mpm[idx]
        m = read_trunc_bin(dec, NUM_LUMA_MODE - NUM_MPM)
        for v in sorted(mpm):
            if m >= v:
                m += 1
        return m

    def _dec_intra_chroma_mode(self, dec, cu: CuData) -> int:
        assert not self.sps.cclm
        if not dec.decode_bin(ct.CTX_SETS["IntraChromaPredMode"](0)):
            return DM_CHROMA
        cand_id = dec.decode_bins_ep(2)
        return chroma_cand_modes(cu.luma_mode)[cand_id]


# ---------------------------------------------------------------------------
# reconstruction (shared)
# ---------------------------------------------------------------------------

def predict_cu_component(ps: PictureState, cu: CuData, comp: int,
                         bit_depth: int) -> np.ndarray:
    """Intra prediction for one component of a CU from current rec state."""
    if comp == 0:
        mode = cu.luma_mode
        x, y, w, h = cu.x, cu.y, cu.w, cu.h
        rec = ps.rec[0]
        mask = ps.coded_luma
        unit = PictureState.LUMA_UNIT
        is_luma = True
    else:
        mode = cu.luma_mode if cu.chroma_dir == DM_CHROMA else cu.chroma_dir
        x, y, w, h = cu.x >> 1, cu.y >> 1, cu.w >> 1, cu.h >> 1
        rec = ps.rec[comp]
        mask = ps.coded_chroma
        unit = PictureState.CHROMA_UNIT
        is_luma = False
    top, left = I.build_reference_samples(rec, x, y, w, h, mask, unit,
                                          bit_depth)
    return I.predict_intra(top, left, mode, w, h, bit_depth, is_luma)


def reconstruct_cu(ps: PictureState, cu: CuData, qp: QpState, qt_depth: int,
                   bit_depth: int) -> None:
    maxval = (1 << bit_depth) - 1
    for comp, coeff in ((0, cu.coeff_y), (1, cu.coeff_cb), (2, cu.coeff_cr)):
        if comp == 0:
            x, y, w, h = cu.x, cu.y, cu.w, cu.h
            q = qp.luma_qp()
        else:
            x, y, w, h = cu.x >> 1, cu.y >> 1, cu.w >> 1, cu.h >> 1
            q = qp.chroma_qp(comp)
        pred = predict_cu_component(ps, cu, comp, bit_depth)
        if coeff is not None and np.any(coeff):
            d = T.dequant_np(coeff, q, bit_depth)
            resi = T.inv_transform_np(d, bit_depth)
            rec = np.clip(pred + resi, 0, maxval)
        else:
            rec = pred
        ps.rec[comp][y:y + h, x:x + w] = rec
        if comp == 0:
            # luma coded progress must be visible for chroma of the same CU?
            # no: chroma uses its own mask; but mark after luma recon so the
            # chroma DM and later CUs see it.
            pass
    ps.mark_cu(cu.x, cu.y, cu.w, cu.h, qt_depth, cu.luma_mode)
