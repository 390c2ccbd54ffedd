"""Perceptual QP adaptation (QPA) based on the XPSNR visual model.

Behavioral reference: vvenc EncoderLib/BitAllocation.cpp —
apprI3Log2 (:64), calcSpatialVisAct/calcTemporalVisAct (:84-200,
kernels AvgHighPassCore Buffer.cpp:334, HDHighPassCore :350,
HDHighPass2Core :366), getAveragePictureActivity (:246),
getGlaringColorQPOffset (:262), applyDeltaQpPeakSmoothing (:376),
applyQPAdaptationSlice (:508).

TPU-first design: the per-pixel high-pass maps and the per-CTU windowed
sums are whole-frame array ops (integral images) instead of vvenc's
per-CTU SIMD loops; everything here is O(pixels) numpy executed once per
frame on the host preprocessing path (a JAX port is a direct transcription
of the same arrays if profiling ever shows it hot).

Scope: CQF + minNoiseLevels clipping (BitAllocation.cpp:323/335 ports),
sub-CTU adaptation (:812), glaring-color offsets, chroma offsets, and
BIM coupling (per-CTU importance offsets from the MCTF stage).  Not yet
ported: rate-control coupling of the QPA offsets, HDR luma mapping,
SCC weighting.
"""

from __future__ import annotations

import math

import numpy as np

MAX_QP = 63


def appr_i3_log2(d: float, weight: float = 3.0) -> int:
    """Rounded 3*log2(d) (vvenc apprI3Log2; SCC uses weight 2)."""
    limit = 1.5e-13 if weight == 3.0 else 5.5e-20
    if d < limit:
        return -128
    return int(math.floor(weight * math.log2(d) + 0.5))


def average_picture_activity(width: int, height: int, temp_filtering: bool,
                             bit_depth: int) -> float:
    """sqrt of the a_pic norm (vvenc getAveragePictureActivity:246)."""
    hp = (32.0 if temp_filtering else 16.0) * float(1 << (2 * bit_depth - 10)) \
        * math.sqrt((3840.0 * 2160.0) / float(width * height))
    return math.sqrt(hp)


def _integral(m: np.ndarray) -> np.ndarray:
    ii = np.zeros((m.shape[0] + 1, m.shape[1] + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(m, axis=0), axis=1)
    return ii


def _box(ii: np.ndarray, y0: int, y1: int, x0: int, x1: int) -> float:
    """Sum over rows [y0, y1) x cols [x0, x1)."""
    if y1 <= y0 or x1 <= x0:
        return 0.0
    return float(ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0])


def _spatial_hp_map(y: np.ndarray) -> np.ndarray:
    """|12*c - 2*(4-neighbors) - (diagonals)| on the interior, 0 on the
    border (vvenc AvgHighPassCore)."""
    s = y.astype(np.int64)
    m = np.zeros_like(s)
    c = s[1:-1, 1:-1]
    m[1:-1, 1:-1] = np.abs(
        12 * c
        - 2 * (s[1:-1, :-2] + s[1:-1, 2:] + s[:-2, 1:-1] + s[2:, 1:-1])
        - (s[:-2, :-2] + s[:-2, 2:] + s[2:, :-2] + s[2:, 2:]))
    return m


def _temporal_hp_map(y: np.ndarray, prev1, prev2, frame_rate: int):
    """Per-pixel temporal activity, 0 on the border.

    1st-order (fps<=31): (1 + 3*|cur-prev|) >> 1 (HDHighPassCore);
    2nd-order: |cur - 2*prev1 + prev2| (HDHighPass2Core)."""
    if prev1 is None:
        return None
    if prev2 is None:
        frame_rate = 24  # force 1st-order when only one previous frame
    s = y.astype(np.int64)
    m = np.zeros_like(s)
    if frame_rate <= 31:
        t = np.abs(s[1:-1, 1:-1] - prev1.astype(np.int64)[1:-1, 1:-1])
        m[1:-1, 1:-1] = (1 + 3 * t) >> 1
    else:
        m[1:-1, 1:-1] = np.abs(s[1:-1, 1:-1]
                               - 2 * prev1.astype(np.int64)[1:-1, 1:-1]
                               + prev2.astype(np.int64)[1:-1, 1:-1])
    return m


def _plane_activity(plane, prev1, prev2, frame_rate, bit_depth,
                    act_min: float):
    """Whole-plane hpVisAct (for the picture-wise chroma operation)."""
    h, w = plane.shape
    sp = _spatial_hp_map(plane)
    hp_spat = float(sp[1:h - 1, 1:w - 1].sum()) / float((w - 2) * (h - 2))
    tm = _temporal_hp_map(plane, prev1, prev2, frame_rate)
    hp_temp = 0.0
    if tm is not None:
        hp_temp = float(tm[1:h - 1, 1:w - 1].sum()) / float((w - 2) * (h - 2))
    return max(act_min, hp_spat + 2.0 * hp_temp)


QPA_MAX_NOISE_LEVELS = 8


def new_min_noise_levels() -> np.ndarray:
    """Sequence-shared per-luma-region minimum noise levels
    (vvenc PicShared::m_minNoiseLevels, init 255 = unset)."""
    return np.full(QPA_MAX_NOISE_LEVELS, 255, dtype=np.uint8)


def update_min_noise_levels(levels: np.ndarray, bit_depth: int,
                            avg_value: int, noise: float) -> None:
    """vvenc updateMinNoiseLevelsPic (BitAllocation.cpp:323)."""
    idx = min(QPA_MAX_NOISE_LEVELS - 1, int(avg_value) >> (bit_depth - 3))
    n = int(0.5 + noise)
    if n < int(levels[idx]):
        levels[idx] = np.uint8(max(0, min(255, n)))


def clip_qp_to_min_stats(levels: np.ndarray, bit_depth: int, avg_value: int,
                         res_fac: float, extra_qp_offset: int,
                         qp: int) -> int:
    """vvenc clipQPValToEstimatedMinimStats (BitAllocation.cpp:335): raise
    the adapted QP to the level implied by the sequence's estimated
    minimum noise for this luma region (don't spend bits coding noise)."""
    idx = min(QPA_MAX_NOISE_LEVELS - 1, int(avg_value) >> (bit_depth - 3))
    x = QPA_MAX_NOISE_LEVELS - 1
    i = int(levels[idx])
    # fill in the blanks in the luma range (peak smoothing)
    if idx == 0 and i > int(levels[1]):
        i = int(levels[1])
    if idx == x and i > int(levels[x - 1]):
        i = int(levels[x - 1])
    if 0 < idx < x:
        nb = max(int(levels[idx - 1]), int(levels[idx + 1]))
        if i > nb:
            i = nb
    if i >= 255:
        return qp
    d = min(1.0, res_fac) * i * i
    i = max(0, appr_i3_log2(d) - 15 + extra_qp_offset)  # 3*log2(i^2)=6*log2
    return max(qp, i)


def apply_qpa_subctu(orig, prev1_orig, prev2_orig, x0: int, y0: int,
                     bw: int, bh: int, pic_initial_qp: int, bit_depth: int,
                     frame_rate: int, is_intra: bool,
                     min_noise=None, tl: int = 0,
                     intra_qp_offset: int = -3) -> int:
    """Sub-CTU QP adaptation (vvenc applyQPAdaptationSubCtu,
    BitAllocation.cpp:812): the slice-level activity model evaluated on
    one sub-area (used for the 64-luma sub-blocks of 128 CTUs)."""
    y = orig[0]
    h, w = y.shape
    guard = 1
    wx0, wy0 = max(0, x0 - guard), max(0, y0 - guard)
    wx1, wy1 = min(w, x0 + bw + guard), min(h, y0 + bh + guard)
    act_min = float(1 << (bit_depth - 6))
    win = y[wy0:wy1, wx0:wx1]
    sp = _spatial_hp_map(win)
    cnt = float((wx1 - wx0 - 2) * (wy1 - wy0 - 2))
    hp_spat = float(sp[1:-1, 1:-1].sum()) / cnt
    hp_temp = 0.0
    if prev1_orig is not None:
        tm = _temporal_hp_map(
            win, prev1_orig[0][wy0:wy1, wx0:wx1],
            prev2_orig[0][wy0:wy1, wx0:wx1] if prev2_orig else None,
            frame_rate)
        hp_temp = float(tm[1:-1, 1:-1].sum()) / cnt
    act = max(act_min, hp_spat + 2.0 * hp_temp)
    norm = 1.0 / average_picture_activity(w, h, not is_intra, bit_depth)
    qp = max(0, min(MAX_QP, pic_initial_qp + appr_i3_log2(act * norm)))
    if qp < MAX_QP:
        x1, y1 = min(w, x0 + bw), min(h, y0 + bh)
        area = float((x1 - x0) * (y1 - y0))
        mean_l = int(y[y0:y1, x0:x1].astype(np.int64).sum() / area)
        mean_cb = int(orig[1][y0 >> 1:y1 >> 1, x0 >> 1:x1 >> 1].mean())
        mean_cr = int(orig[2][y0 >> 1:y1 >> 1, x0 >> 1:x1 >> 1].mean())
        mid = 1 << (bit_depth - 1)
        chr_min = min(mean_cb, mean_cr)
        v = mean_l - chr_min
        if v > mid:
            qp = min(MAX_QP, qp + appr_i3_log2(float(v * v)
                                               / float(mid * mid)))
    if min_noise is not None:
        x1, y1 = min(w, x0 + bw), min(h, y0 + bh)
        mean_l = int(y[y0:y1, x0:x1].mean())
        res_fac = math.sqrt(float(w * h) / (3840.0 * 2160.0))
        extra = (intra_qp_offset >> 1) if is_intra else min(4, tl)
        qp = clip_qp_to_min_stats(min_noise, bit_depth, mean_l, res_fac,
                                  extra, qp)
    return qp


class QpaResult:
    __slots__ = ("ctu_qps", "ctu_lambdas", "chroma_qp_offsets", "avg_qp")


def apply_qpa_slice(orig, prev1_orig, prev2_orig, slice_qp: int,
                    slice_lambda: float, ctu_size: int, bit_depth: int,
                    frame_rate: int, is_intra: bool,
                    chroma_table=None, min_noise=None, tl: int = 0,
                    intra_qp_offset: int = -3,
                    bim_offsets=None) -> QpaResult:
    """Per-CTU adapted QPs + lambdas (vvenc applyQPAdaptationSlice:508,
    CQF path).

    orig / prev*_orig: {0: Y, 1: Cb, 2: Cr} planes at internal bit depth
    (prev frames are the previous ORIGINAL frames in display order, None
    at a sequence start).  chroma_table: callable qp->qpc for the slice
    chroma offset adaptation (optional).
    """
    y = orig[0]
    h, w = y.shape
    n_cx = (w + ctu_size - 1) // ctu_size
    n_cy = (h + ctu_size - 1) // ctu_size
    n_ctu = n_cx * n_cy
    act_min = float(1 << (bit_depth - 6))

    sp_ii = _integral(_spatial_hp_map(y))
    tm = _temporal_hp_map(y, prev1_orig[0] if prev1_orig else None,
                          prev2_orig[0] if prev2_orig else None, frame_rate)
    tm_ii = _integral(tm) if tm is not None else None
    o_ii = _integral(y.astype(np.int64))
    cb_ii = _integral(orig[1].astype(np.int64))
    cr_ii = _integral(orig[2].astype(np.int64))

    guard = 1  # isHighResolution (min dim > 1280) would use 2
    ctu_act = np.zeros(n_ctu)
    ctu_mean_luma = np.zeros(n_ctu, dtype=np.int64)
    ctu_mean_cb = np.zeros(n_ctu, dtype=np.int64)
    ctu_mean_cr = np.zeros(n_ctu, dtype=np.int64)
    hp_luma_pic = 0.0
    for addr in range(n_ctu):
        x0 = (addr % n_cx) * ctu_size
        y0 = (addr // n_cx) * ctu_size
        x1 = min(w, x0 + ctu_size)
        y1 = min(h, y0 + ctu_size)
        # filter window interior: window = CTU +- guard (clipped), first/last
        # row+col of the window skipped by the kernels
        wx0 = max(0, x0 - guard)
        wy0 = max(0, y0 - guard)
        wx1 = min(w, x0 + ctu_size + guard)
        wy1 = min(h, y0 + ctu_size + guard)
        cnt = float((wx1 - wx0 - 2) * (wy1 - wy0 - 2))
        hp_spat = _box(sp_ii, wy0 + 1, wy1 - 1, wx0 + 1, wx1 - 1) / cnt
        hp_temp = (_box(tm_ii, wy0 + 1, wy1 - 1, wx0 + 1, wx1 - 1) / cnt
                   if tm_ii is not None else 0.0)
        act = max(act_min, hp_spat + 2.0 * hp_temp)
        ctu_act[addr] = act
        hp_luma_pic += act * float((x1 - x0) * (y1 - y0))
        area = float((x1 - x0) * (y1 - y0))
        ctu_mean_luma[addr] = int(_box(o_ii, y0, y1, x0, x1) / area)
        carea = float(((x1 - x0) >> 1) * ((y1 - y0) >> 1)) or 1.0
        ctu_mean_cb[addr] = int(_box(cb_ii, y0 >> 1, y1 >> 1,
                                     x0 >> 1, x1 >> 1) / carea)
        ctu_mean_cr[addr] = int(_box(cr_ii, y0 >> 1, y1 >> 1,
                                     x0 >> 1, x1 >> 1) / carea)
    hp_luma_pic /= float(w * h)

    norm = 1.0 / average_picture_activity(w, h, not is_intra, bit_depth)
    mid = 1 << (bit_depth - 1)

    def glaring_offset(mean_l, mean_cb, mean_cr):
        chr_min = min(int(mean_cb), int(mean_cr))
        v = int(mean_l) - chr_min
        if v > mid:
            return appr_i3_log2(float(v * v) / float(mid * mid))
        return 0

    # per-CTU adapted QP
    res_fac = math.sqrt(float(w * h) / (3840.0 * 2160.0))
    extra = (intra_qp_offset >> 1) if is_intra else min(4, tl)
    qps = np.zeros(n_ctu, dtype=np.int32)
    for addr in range(n_ctu):
        q = max(0, min(MAX_QP,
                       slice_qp + appr_i3_log2(ctu_act[addr] * norm)))
        if q < MAX_QP:
            q += glaring_offset(ctu_mean_luma[addr], ctu_mean_cb[addr],
                                ctu_mean_cr[addr])
            q = min(q, MAX_QP)
        if min_noise is not None:
            # don't spend bits coding sequence noise (BitAllocation.cpp:445)
            q = min(MAX_QP, clip_qp_to_min_stats(
                min_noise, bit_depth, int(ctu_mean_luma[addr]), res_fac,
                extra, q))
        if bim_offsets is not None:
            # block importance mapping delta (MCTF BIM, MCTF.cpp:1046)
            q = max(0, min(MAX_QP, q + int(bim_offsets[addr])))
        qps[addr] = q

    lambdas = slice_lambda * np.exp2((qps - slice_qp) / 3.0)

    # 3x3 delta-QP peak smoothing (vvenc applyDeltaQpPeakSmoothing:376):
    # raster scan, neighborhood mixes already-smoothed (above/left) and
    # original (right/below) values
    if n_cx > 0 and n_ctu > 3 * n_cx:
        prev_row = np.zeros(n_cx, dtype=np.int32)
        pre_smooth = 0
        for addr in range(n_ctu - n_cx):
            idx = addr % n_cx
            if addr < n_cx:
                prev_row[idx] = qps[addr]
            elif idx == 0:
                pre_smooth = qps[addr]
            elif idx == n_cx - 1:
                prev_row[idx - 1] = pre_smooth
                prev_row[idx] = qps[addr]
            else:
                nxt = addr + n_cx
                qmax = max(pre_smooth, qps[addr + 1])
                qmin = min(pre_smooth, qps[addr + 1])
                for i in (-1, 0, 1):
                    qmax = max(qmax, prev_row[idx + i], qps[nxt + i])
                    qmin = min(qmin, prev_row[idx + i], qps[nxt + i])
                prev_row[idx - 1] = pre_smooth
                pre_smooth = qps[addr]
                if pre_smooth > qmax:
                    lambdas[addr] *= 0.793701
                    qps[addr] -= 1
                if pre_smooth < qmin:
                    lambdas[addr] *= 1.259921
                    qps[addr] += 1

    res = QpaResult()
    res.ctu_qps = qps
    res.ctu_lambdas = lambdas
    res.avg_qp = int((qps.sum() + (n_ctu >> 1)) // n_ctu)

    # slice-level chroma QP offset adaptation (picture-wise chroma activity)
    res.chroma_qp_offsets = (0, 0)
    if chroma_table is not None:
        avg_l = max(0, min(MAX_QP,
                           slice_qp + appr_i3_log2(hp_luma_pic * norm)))
        if avg_l < MAX_QP:
            pic_mean_l = int(y.mean())
            pic_mean_cb = int(orig[1].mean())
            pic_mean_cr = int(orig[2].mean())
            avg_l = min(MAX_QP, avg_l + glaring_offset(
                pic_mean_l, pic_mean_cb, pic_mean_cr))
        offs = []
        for comp in (1, 2):
            hp_c = _plane_activity(
                orig[comp],
                prev1_orig[comp] if prev1_orig else None,
                prev2_orig[comp] if prev2_orig else None,
                frame_rate, bit_depth, act_min)
            adapt = 0 if 1.5 * hp_c <= hp_luma_pic else \
                appr_i3_log2(1.5 * hp_c / hp_luma_pic)
            lcm_dqp = (avg_l - chroma_table(avg_l)) >> 1
            offs.append(min(3 + lcm_dqp, adapt + lcm_dqp))
        res.chroma_qp_offsets = tuple(offs)
    return res
