"""Encoder-side LMCS model derivation (EncReshape analog).

Reimplements the reference SDR adaptation pipeline with vectorized numpy:
  - per-pixel windowed variance stats:   EncReshape::calcSeqStats
        (EncReshape.cpp:184-439) — here as summed-area tables instead of
        the reference's incremental row/column updates
  - decision tree + codeword assignment: EncReshape::preAnalyzerLMCS
        (:440), deriveReshapeParametersSDR (:752), cwPerturbation (:704),
        cwReduction (:729)
  - PWL model finalization:              EncReshape::constructReshaperLMCS
        (:1109), adjustLmcsPivot (:1206)
  - per-picture slice control:           EncGOP::xInitLMCS
        (EncGOP.cpp:2275-2400)

Only the SDR signal type is implemented (reference HDR-PQ/HLG paths are
config-gated the same way upstream).
"""

from __future__ import annotations

import numpy as np

from ..codec.lmcs import (LmcsParam, ReshapeState, PIC_CODE_CW_BINS)

PIC_ANALYZE_CW_BINS = 32
LMCS_SEG_NUM = 32


class SeqStats:
    def __init__(self, bin_num: int):
        self.bin_hist = np.zeros(bin_num)
        self.bin_var = np.zeros(bin_num)
        self.norm_var = np.zeros(bin_num)
        self.min_bin_var = 5.0
        self.max_bin_var = 0.0
        self.mean_bin_var = 0.0
        self.nonzero_cnt = 0
        self.weight_var = 0.0
        self.weight_norm = 0.0
        self.ratio_std_u = 0.0
        self.ratio_std_v = 0.0


def _window_stats(y: np.ndarray, win: int):
    """Clamped sliding-window mean/variance per pixel via summed-area
    tables (equivalent to the reference's incremental window sums)."""
    h, w = y.shape
    y64 = y.astype(np.int64)
    s = np.zeros((h + 1, w + 1), np.int64)
    s2 = np.zeros((h + 1, w + 1), np.int64)
    s[1:, 1:] = y64.cumsum(0).cumsum(1)
    s2[1:, 1:] = (y64 * y64).cumsum(0).cumsum(1)
    yy, xx = np.mgrid[0:h, 0:w]
    y1 = np.maximum(yy - win, 0)
    y2 = np.minimum(yy + win, h - 1)
    x1 = np.maximum(xx - win, 0)
    x2 = np.minimum(xx + win, w - 1)
    n = (x2 - x1 + 1) * (y2 - y1 + 1)

    def rect(tab):
        return (tab[y2 + 1, x2 + 1] - tab[y1, x2 + 1]
                - tab[y2 + 1, x1] + tab[y1, x1])
    mean = rect(s) / n
    var = rect(s2) / n - mean * mean
    return mean, var


def calc_seq_stats(planes, bit_depth: int, bin_num: int,
                   pic_size: int) -> SeqStats:
    """EncReshape::calcSeqStats (EncReshape.cpp:184)."""
    y = planes[0]
    h, w = y.shape
    win = (min(h, w) // 240) if bin_num == PIC_CODE_CW_BINS else 2
    win = max(win, 1)
    stats = SeqStats(bin_num)
    _, var = _window_stats(y, win)
    if bit_depth > 10:
        var = var / (1 << (2 * bit_depth - 20))
    elif bit_depth < 10:
        var = var * (1 << (20 - 2 * bit_depth))
    var_log = np.log10(var + 1.0)
    bin_len = (1 << bit_depth) // bin_num
    bins = (y // bin_len).astype(np.int64).ravel()
    cnt = np.bincount(bins, minlength=bin_num)[:bin_num]
    acc = np.bincount(bins, weights=var_log.ravel(),
                      minlength=bin_num)[:bin_num]
    stats.bin_hist = cnt / float(pic_size)
    stats.bin_var = np.where(cnt > 0, acc / np.maximum(cnt, 1), 0.0)

    sig = stats.bin_hist > 0.001
    stats.nonzero_cnt = int(sig.sum())
    if stats.nonzero_cnt:
        stats.mean_bin_var = float(stats.bin_var[sig].mean())
        stats.max_bin_var = float(stats.bin_var[sig].max())
        stats.min_bin_var = float(min(5.0, stats.bin_var[sig].min()))
    if stats.mean_bin_var > 0.0:
        stats.norm_var = stats.bin_var / stats.mean_bin_var
    stats.weight_var = float((stats.bin_hist * stats.bin_var).sum())
    stats.weight_norm = float((stats.bin_hist * stats.norm_var).sum())

    var_y = float(np.var(y.astype(np.float64)))
    if len(planes) > 2 and var_y > 0:
        stats.ratio_std_u = float(np.sqrt(np.var(
            planes[1].astype(np.float64))) / np.sqrt(var_y))
        stats.ratio_std_v = float(np.sqrt(np.var(
            planes[2].astype(np.float64))) / np.sqrt(var_y))
    return stats


class LmcsEncoder:
    """Per-sequence LMCS control state (EncReshape + xInitLMCS)."""

    def __init__(self, bit_depth: int, base_qp: int, pic_size: int,
                 update_ctrl: int = 0, adp_option: int = 0,
                 initial_cw: int = 0, crs_offset: int = 0,
                 fps_to_ip: int = 16, signal_type: int = 0):
        self.bit_depth = bit_depth
        self.lut_size = 1 << bit_depth
        self.init_cw = self.lut_size // PIC_CODE_CW_BINS
        self.base_qp = base_qp
        self.pic_size = pic_size
        self.update_ctrl = update_ctrl
        self.adp_option = adp_option
        self.initial_cw = initial_cw
        self.crs_offset = crs_offset
        self.fps_to_ip = max(16, fps_to_ip)
        self.signal_type = signal_type
        # persistent sequence state
        self.reshape_on = True       # m_reshape
        self.tcase = 0
        self.rate_adp_mode = 0
        self.chroma_adj = 1
        self.disable_lmcs_ip = False     # m_disableLMCSIP
        self.cur_param: LmcsParam | None = None
        self.cur_state: ReshapeState | None = None

    # -- per-picture entry (EncGOP::xInitLMCS) ---------------------------
    def init_picture(self, planes, poc: int, is_intra: bool, tlayer: int,
                     use_lmcs: bool = True):
        """Returns (slice_lmcs_enabled, model_present, chroma_scale_flag).
        When model_present, self.cur_param holds the new LmcsParam to put
        in an APS; self.cur_state always holds the active ReshapeState (or
        None when the slice doesn't reshape)."""
        if not use_lmcs or (not is_intra and self.disable_lmcs_ip):
            if is_intra:
                self.disable_lmcs_ip = True
            return False, False, False
        if is_intra:
            self.disable_lmcs_ip = False
        rsp_tid = tlayer + (0 if is_intra else 1)

        mod_ip = poc % self.fps_to_ip
        if is_intra or (self.update_ctrl == 2 and mod_ip == 0):
            enabled, present = self._pre_analyze_intra(planes)
            if present:
                self.cur_param = self._construct_param()
                self.cur_state = ReshapeState(self.cur_param, self.bit_depth)
            if not enabled:
                return False, present, False
            return True, present, self.chroma_adj == 1
        # inter slice: reuse the model, per-TL enable rule
        if not self.reshape_on or self.cur_state is None:
            return False, False, False
        t = self.tcase
        enable = (False if t == 5 else
                  (rsp_tid >= t + 1) if t < 5 else (rsp_tid <= 10 - t))
        if enable:
            enable = self._inter_slice_check(planes)
        return enable, False, enable and self.chroma_adj == 1

    # -- intra analysis (preAnalyzerLMCS, I-slice branch) ----------------
    def _pre_analyze_intra(self, planes):
        bin_num = PIC_CODE_CW_BINS
        bin_len = self.lut_size // bin_num
        std_min, std_max = 16 << (self.bit_depth - 8), \
            235 << (self.bit_depth - 8)
        start_bin = std_min // bin_len
        end_bin = std_max // bin_len
        self.min_bin = start_bin
        self.max_bin = end_bin
        init_cw_analyze = bin_len if self.bit_depth == 10 else (
            bin_len >> (self.bit_depth - 10) if self.bit_depth > 10
            else bin_len << (10 - self.bit_depth))
        self.init_cw_analyze = init_cw_analyze
        self.bin_cw = np.full(bin_num, init_cw_analyze, np.int64)
        self.bin_num = bin_num
        self.reshape_on = True
        self.use_adp_cw = False
        self.cw0 = 36
        self.chroma_weight = 1.0
        self.chroma_adj = 1
        self.rate_adp_mode = 0
        self.tcase = 0
        intra_adp = inter_adp = True

        st = calc_seq_stats(planes, self.bit_depth, bin_num, self.pic_size)
        self.stats = st
        exceed_std = (st.bin_hist[0] + st.bin_hist[-1]) > 0.005
        if st.bin_hist[-1] > 0.0003 or st.bin_hist[0] > 0.03:
            intra_adp = inter_adp = False
        if exceed_std:
            nz = np.nonzero(st.bin_hist > 0)[0]
            if nz.size:
                start_bin = min(start_bin, int(nz[0]))
                end_bin = max(end_bin, int(nz[-1]))
            self.min_bin, self.max_bin = start_bin, end_bin
        if (st.ratio_std_u + st.ratio_std_v) > 1.5 and st.bin_hist[1] > 0.5:
            intra_adp = inter_adp = False
        if (st.ratio_std_u > 0.36 and st.ratio_std_v > 0.2
                and self.pic_size > 5184000):
            self.chroma_adj = 0
            self.chroma_weight = 1.05
            if (st.ratio_std_u + st.ratio_std_v) < 0.69:
                self.chroma_weight = 0.95

        max_cw = 1022
        if inter_adp:
            if self.adp_option:
                max_cw = self.initial_cw
                self.rate_adp_mode = self.adp_option % 2
                if self.adp_option == 2:
                    self.tcase = 9
                elif self.adp_option > 2:
                    intra_adp = False
            else:
                max_cw = 1022
                intra_adp, inter_adp, max_cw = self._derive_sdr(
                    intra_adp, inter_adp, start_bin, end_bin)

        if self.rate_adp_mode == 2 and self.base_qp <= 22:
            intra_adp = inter_adp = False
        if not intra_adp and not inter_adp:
            self.reshape_on = False
            return False, False

        if self.rate_adp_mode == 1 and self.base_qp <= 22:
            self.bin_cw[:] = 0
            self.bin_cw[start_bin:end_bin + 1] = init_cw_analyze + 2
        elif self.use_adp_cw:
            # adaptive per-bin CW from variance (updateCtrl==2 path):
            # re-analyze at 32-bin resolution (preAnalyzerLMCS:556-562)
            if self.signal_type == 0 and self.update_ctrl == 2:
                self.bin_num = PIC_ANALYZE_CW_BINS
                start_bin, end_bin = start_bin * 2, end_bin * 2 + 1
                self.stats = calc_seq_stats(planes, self.bit_depth,
                                            self.bin_num, self.pic_size)
                self.bin_cw = np.zeros(self.bin_num, np.int64)
            lo, hi = start_bin, end_bin
            arr = self.stats.bin_var
            alpha, beta = _derive_alpha_beta(arr, lo, hi, self.cw0, max_cw)
            self.bin_cw = np.zeros(self.bin_num, np.int64)
            self.bin_cw[lo:hi + 1] = np.round(
                alpha * arr[lo:hi + 1] + beta).astype(np.int64)
        else:
            self._cw_perturbation(start_bin, end_bin, max_cw)
        self._cw_reduction(start_bin, end_bin)
        return intra_adp, True

    def _inter_slice_check(self, planes) -> bool:
        """Inter-slice histogram sanity gate (preAnalyzerLMCS else-branch,
        EncReshape.cpp:585-680)."""
        y = planes[0]
        bin_len = self.lut_size // PIC_CODE_CW_BINS
        cnt = np.bincount((y // bin_len).astype(np.int64).ravel(),
                          minlength=PIC_CODE_CW_BINS)[:PIC_CODE_CW_BINS]
        hist = cnt / float(self.pic_size)
        if hist[-1] > 0.0003 or hist[0] > 0.03:
            return False
        var_y = float(np.var(y.astype(np.float64)))
        if len(planes) > 2 and var_y > 0:
            ru = float(np.sqrt(np.var(planes[1].astype(np.float64)))
                       / np.sqrt(var_y))
            rv = float(np.sqrt(np.var(planes[2].astype(np.float64)))
                       / np.sqrt(var_y))
            if (ru + rv) > 1.5 and hist[1] > 0.5:
                return False
        return True

    # -- SDR decision tree (deriveReshapeParametersSDR) -------------------
    def _derive_sdr(self, intra_adp, inter_adp, start_bin, end_bin):
        st = self.stats
        n = self.bin_num
        order = np.argsort(-st.bin_var, kind="stable")
        var_dsd = st.bin_var[order]
        cdf = np.cumsum(st.bin_hist[order])
        f1 = f2 = f3 = 0
        for b in range(n - 1):
            if var_dsd[b] > 3.4:
                f1 = b + 1
            if var_dsd[b] > 2.8:
                f2 = b + 1
            if var_dsd[b] > 2.5:
                f3 = b + 1
        p1, p2, p3 = cdf[f1], cdf[f2], cdf[f3]

        max_cw = 1022
        self._cw_perturbation(start_bin, end_bin, max_cw)
        self._cw_reduction(start_bin, end_bin)
        # reshaped-domain stats
        scale = np.where(self.bin_cw > 0,
                         self.bin_cw / float(self.init_cw_analyze), 1.0)
        rsp_var = st.bin_var + 2.0 * np.log10(scale)
        sig = st.bin_hist > 0.001
        rsp_mean = float(rsp_var[sig].mean()) if sig.any() else 0.0
        rsp_norm = rsp_var / rsp_mean if rsp_mean > 0 else rsp_var * 0
        rsp_wvar = float((st.bin_hist * rsp_var).sum())
        rsp_wnorm = float((st.bin_hist * rsp_norm).sum())
        ratio_wei = rsp_wvar / st.weight_var if st.weight_var else 1.0
        ratio_norm = rsp_wnorm / st.weight_norm if st.weight_norm else 1.0

        if ((st.bin_hist[0] + st.bin_hist[-1]) > 0.0001
                and st.bin_hist[-2] < 0.001):
            if (p3 > 0.8 and p2 > 0.4 and st.bin_var[-2] > 4.8) or \
               (p3 < 0.1 and p1 < 0.05 and st.bin_var[-2] < 4.0):
                return False, False, max_cw

        is_low = (self.pic_size > 5184000 or st.bin_var[1] > 4.0
                  or (rsp_mean > 3.4 and ratio_norm > 1.005
                      and ratio_wei > 1.02)
                  or (rsp_mean > 3.1 and ratio_norm > 1.005
                      and ratio_wei > 1.04)
                  or (rsp_mean > 2.8 and ratio_norm > 1.01
                      and ratio_wei > 1.04))

        if self.update_ctrl == 0:
            max_cw = 1022
            if is_low:
                intra_adp = False
                self.rate_adp_mode = 1
                max_cw = 980
                if st.bin_hist[-2] > 0.05:
                    max_cw = 896
                    if st.bin_var[-2] < 1.2:
                        max_cw = 938
                elif p2 < 0.8 and p3 == 1.0:
                    self.rate_adp_mode = 1
                    max_cw = 938
            if st.bin_hist[-2] < 0.001:
                if st.bin_hist[1] > 0.05 and st.bin_var[1] > 3.0:
                    intra_adp = True
                    self.rate_adp_mode = 1
                    max_cw = 784
                elif st.bin_hist[1] < 0.006:
                    intra_adp = False
                    self.rate_adp_mode = 0
                    max_cw = 1008
                elif p3 < 0.5:
                    intra_adp = True
                    self.rate_adp_mode = 0
                    max_cw = 1022
            elif (st.max_bin_var > 4.0 and rsp_mean > 3.2 and p2 < 0.25) \
                    or ratio_wei < 1.03:
                intra_adp = True
                self.rate_adp_mode = 0
                max_cw = 1022
            if intra_adp and self.rate_adp_mode == 0:
                self.tcase = 9
        elif self.update_ctrl == 1:
            max_cw = 952
            if is_low:
                if self.pic_size > 5184000:
                    self.rate_adp_mode = 1
                    max_cw = 812
                if st.bin_hist[-2] > 0.05:
                    self.rate_adp_mode = 1
                    max_cw = 812
                    if st.bin_hist[-2] > 0.1 or st.bin_hist[1] > 0.1:
                        self.rate_adp_mode = 0
                        max_cw = 924
                elif p2 < 0.8 and p3 == 1.0:
                    self.rate_adp_mode = 1
                    max_cw = 896
                elif p2 > 0.98 and st.bin_hist[1] > 0.05:
                    self.rate_adp_mode = 0
                    max_cw = 784
                elif p2 < 0.1:
                    self.rate_adp_mode = 0
                    max_cw = 1022
            if st.bin_hist[1] > 0.1 and 1.8 < st.bin_var[1] < 3.0:
                self.rate_adp_mode = 1
                if 1.2 < st.bin_var[-2] < 4.0:
                    max_cw = 784
            elif st.bin_hist[-2] < 0.001:
                if st.bin_hist[1] > 0.05 and st.bin_var[1] > 3.0:
                    self.rate_adp_mode = 1
                    max_cw = 784
                elif st.bin_hist[1] < 0.006:
                    self.rate_adp_mode = 0
                    max_cw = 980
                elif p3 < 0.5:
                    self.rate_adp_mode = 0
                    max_cw = 924
            elif (st.max_bin_var > 4.0 and rsp_mean > 3.2 and p2 < 0.25) \
                    or ratio_wei < 1.03:
                self.rate_adp_mode = 0
                max_cw = 980
        else:  # updateCtrl == 2
            self.use_adp_cw = True
            self.cw0, max_cw = 36, 30
            if is_low:
                if st.bin_hist[-2] > 0.05:
                    self.use_adp_cw = False
                    self.rate_adp_mode = 1
                    max_cw = 896
                    if st.bin_hist[1] > 0.005:
                        self.rate_adp_mode = 0
                elif p2 < 0.8 and p3 == 1.0:
                    max_cw = 28
            if st.bin_hist[1] > 0.1 and 1.8 < st.bin_var[1] < 3.0:
                self.use_adp_cw = False
                self.rate_adp_mode = 1
                max_cw = 952
            elif (st.bin_hist[1] > 0.05 and st.bin_hist[-2] < 0.001
                  and st.bin_var[1] > 3.0):
                self.use_adp_cw = False
                self.rate_adp_mode = 1
                max_cw = 784
            elif (st.bin_hist[1] > 0.05 and st.bin_hist[-2] < 0.005
                  and 1.0 < st.bin_var[1] < 1.5):
                self.rate_adp_mode = 2
                self.cw0 = 38
            elif (st.bin_hist[1] < 0.005 and st.bin_hist[-2] > 0.05
                  and 1.0 < st.bin_var[-2] < 1.5):
                self.rate_adp_mode = 2
                self.cw0 = 36
            elif (st.bin_hist[1] > 0.02 and st.bin_hist[-2] > 0.04
                  and st.bin_var[1] < 2.0 and st.bin_var[-2] < 1.5):
                self.rate_adp_mode = 2
                self.cw0 = 34
            elif (st.bin_hist[1] > 0.05 and st.bin_hist[-2] > 0.2
                  and 3.0 < st.bin_var[1] < 4.0) or ratio_wei < 1.03:
                self.rate_adp_mode = 1
                self.cw0 = 34
            elif st.bin_var[1] < 4.0 and p2 == 1.0 and p3 == 1.0:
                self.rate_adp_mode = 0
                self.cw0 = 34
            if self.use_adp_cw and not is_low:
                max_cw = 66 - self.cw0
        return intra_adp, inter_adp, max_cw

    # -- codeword shaping --------------------------------------------------
    def _cw_perturbation(self, start_bin, end_bin, max_cw):
        st = self.stats
        cw = np.zeros(self.bin_num, np.int64)
        cw[start_bin:end_bin + 1] = int(round(
            max_cw / (end_bin - start_bin + 1)))
        hist = np.minimum(st.bin_hist, 0.4)
        d1 = np.floor(10.0 * hist + 0.5).astype(np.int64)
        d2 = np.floor(20.0 * hist + 0.5).astype(np.int64)
        sig = st.bin_hist > 0.001
        cw = np.where(sig & (st.norm_var < 0.8), cw + d2,
                      np.where(sig & (st.norm_var < 0.9), cw + d1, cw))
        cw = np.where(sig & (st.norm_var > 1.2), cw - d2,
                      np.where(sig & (st.norm_var > 1.1), cw - d1, cw))
        self.bin_cw = cw

    def _cw_reduction(self, start_bin, end_bin):
        tot = ((self.lut_size >> (self.bit_depth - 10))
               if self.bit_depth > 10 else
               (self.lut_size << (10 - self.bit_depth))
               if self.bit_depth < 10 else self.lut_size)
        max_allowed = tot - 1
        used = int(self.bin_cw.sum())
        if used > max_allowed:
            delta = used - max_allowed
            nbins = end_bin - start_bin + 1
            div, mod = divmod(delta, nbins)
            if div > 0:
                self.bin_cw[start_bin:end_bin + 1] -= div
            for i in range(start_bin, end_bin + 1):
                if mod == 0:
                    break
                if self.bin_cw[i] > 0:
                    self.bin_cw[i] -= 1
                    mod -= 1

    # -- model finalization (constructReshaperLMCS + adjustLmcsPivot) -----
    def _construct_param(self) -> LmcsParam:
        bd_shift = self.bit_depth - 10
        cw = self.bin_cw.astype(np.int64).copy()
        if bd_shift > 0:
            cw = cw * (1 << bd_shift)
        elif bd_shift < 0:
            cw = cw // (1 << (-bd_shift))
        if self.bin_num == PIC_ANALYZE_CW_BINS:
            cw = cw[0::2] + cw[1::2]
        cw = cw[:PIC_CODE_CW_BINS]
        nz = np.nonzero(cw > 0)[0]
        min_bin = int(nz[0]) if nz.size else 0
        max_bin = int(nz[-1]) if nz.size else PIC_CODE_CW_BINS - 1
        cw, max_bin = _adjust_lmcs_pivot(cw, min_bin, max_bin,
                                         self.bit_depth)
        p = LmcsParam()
        p.min_bin_idx = min_bin
        p.max_bin_idx = max_bin
        deltas = (cw - self.init_cw).astype(int)
        max_abs = 0
        for i in range(min_bin, max_bin + 1):
            p.bin_cw_delta[i] = int(deltas[i])
            max_abs = max(max_abs, abs(int(deltas[i])))
        # 1 + floorLog2(max(1, maxAbsDeltaCW)) (constructReshaperLMCS)
        p.max_nbits_delta_cw = 1 + (max(1, max_abs).bit_length() - 1)
        p.crs_offset = self.crs_offset
        return p


def _derive_alpha_beta(arr, start, end, max_cw, min_cw):
    """EncReshape::deriveReshapeParameters (EncReshape.cpp:1006)."""
    seg = arr[start:end + 1]
    min_var, max_var = float(np.min(seg)), float(np.max(seg))
    min_var = min(min_var, 10.0)
    alpha = (min_cw - max_cw) / (max_var - min_var)
    beta = (max_cw * max_var - min_cw * min_var) / (max_var - min_var)
    return alpha, beta


def _adjust_lmcs_pivot(bin_cw, min_bin, max_bin, bit_depth):
    """EncReshape::adjustLmcsPivot (EncReshape.cpp:1206): force mapped
    pivots onto the 32-segment grid required by the inverse-LUT spec."""
    org_cw = (1 << bit_depth) // PIC_CODE_CW_BINS
    log2_seg = bit_depth - (LMCS_SEG_NUM.bit_length() - 1)
    cw = bin_cw.copy()
    pivot = np.zeros(PIC_CODE_CW_BINS + 1, np.int64)
    for i in range(PIC_CODE_CW_BINS):
        pivot[i + 1] = pivot[i] + cw[i]
    seg_idx_max = int(pivot[max_bin + 1] >> log2_seg)
    for i in range(min_bin, max_bin + 1):
        pivot[i + 1] = pivot[i] + cw[i]
        cur = int(pivot[i] >> log2_seg)
        nxt = int(pivot[i + 1] >> log2_seg)
        if cur == nxt and pivot[i] != (cur << log2_seg):
            if cur == seg_idx_max:
                pivot[i] = pivot[max_bin + 1]
                for j in range(i, max_bin + 1):
                    pivot[j + 1] = pivot[i]
                    cw[j] = 0
                cw[i - 1] = int(pivot[i] - pivot[i - 1])
                break
            adjust = ((cur + 1) << log2_seg) - int(pivot[i + 1])
            pivot[i + 1] += adjust
            cw[i] += adjust
            for j in range(i + 1, max_bin + 1):
                if cw[j] < adjust + (org_cw >> 3):
                    adjust -= int(cw[j]) - (org_cw >> 3)
                    cw[j] = org_cw >> 3
                else:
                    cw[j] -= adjust
                    adjust = 0
                if adjust == 0:
                    break
    nz = np.nonzero(cw > 0)[0]
    new_max = int(nz[-1]) if nz.size else max_bin
    return cw, new_max
