"""CCLM (cross-component linear model) chroma intra prediction.

H.266 8.4.5.2.13/14; behavioral reference: vvenc
IntraPrediction::loadLMLumaRecPels (IntraPrediction.cpp:1165),
xGetLMParameters (:1408), predIntraChromaLM (:385).  4:2:0, non-vertical-
collocated chroma (sps.verCollocatedChroma == 0) scope.
"""

from __future__ import annotations

import numpy as np

LM_CHROMA_IDX = 81
MDLM_L_IDX = 82
MDLM_T_IDX = 83
CCLM_MODES = (LM_CHROMA_IDX, MDLM_L_IDX, MDLM_T_IDX)

_DIV_SIG_TABLE = [0, 7, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1, 1, 1, 0]


def _ds_interior(luma, x0, y0, cw, ch, left_avail):
    """6-tap 4:2:0 downsample of the co-located luma block -> [ch, cw]."""
    ys = np.arange(y0, y0 + 2 * ch, 2)
    xs = np.arange(x0, x0 + 2 * cw, 2)
    lm1 = xs - 1
    if not left_avail:
        lm1 = lm1.copy()
        lm1[0] = xs[0]
    r0 = luma[np.ix_(ys, xs)].astype(np.int32)
    r1 = luma[np.ix_(ys + 1, xs)].astype(np.int32)
    s = (4 + 2 * r0 + luma[np.ix_(ys, xs + 1)] + luma[np.ix_(ys, lm1)]
         + 2 * r1 + luma[np.ix_(ys + 1, xs + 1)] + luma[np.ix_(ys + 1, lm1)])
    return (s >> 3).astype(np.int32)


def _ds_above(luma, x0, y0, n, left_avail, first_ctu_row):
    """Downsampled above-template luma row of length n (chroma units)."""
    xs = np.arange(x0, x0 + 2 * n, 2)
    lm1 = xs - 1
    if not left_avail:
        lm1 = lm1.copy()
        lm1[0] = xs[0]
    if first_ctu_row:
        ly = y0 - 1
        s = (2 + 2 * luma[ly, xs].astype(np.int32) + luma[ly, lm1]
             + luma[ly, xs + 1])
        return (s >> 2).astype(np.int32)
    ly = y0 - 2
    s = (4 + 2 * luma[ly, xs].astype(np.int32) + luma[ly, xs + 1]
         + luma[ly, lm1] + 2 * luma[ly + 1, xs].astype(np.int32)
         + luma[ly + 1, xs + 1] + luma[ly + 1, lm1])
    return (s >> 3).astype(np.int32)


def _ds_left(luma, x0, y0, n):
    """Downsampled left-template luma column of length n (chroma units)."""
    ys = np.arange(y0, y0 + 2 * n, 2)
    lx = x0 - 2
    s = (4 + 2 * luma[ys, lx].astype(np.int32) + luma[ys, lx + 1]
         + luma[ys, lx - 1] + 2 * luma[ys + 1, lx].astype(np.int32)
         + luma[ys + 1, lx + 1] + luma[ys + 1, lx - 1])
    return (s >> 3).astype(np.int32)


def _count_avail(coded, ux, uy, n, dx, dy, uw, uh):
    """Contiguous available 2x2-chroma units from (ux, uy) stepping."""
    cnt = 0
    for k in range(n):
        x, y = ux + k * dx, uy + k * dy
        if x < 0 or y < 0 or x >= uw or y >= uh or not coded[y, x]:
            break
        cnt += 1
    return cnt


def cclm_predict(ps, cu, comp: int, bit_depth: int, ctu_size: int
                 ) -> np.ndarray:
    """CCLM prediction for one chroma component -> [ch, cw] int32."""
    mode = cu.chroma_dir
    cx, cy = cu.x >> 1, cu.y >> 1
    cw, ch = cu.w >> 1, cu.h >> 1
    x0, y0 = cu.x, cu.y          # luma position
    luma = ps.rec[0]
    chroma = ps.rec[comp]
    coded = ps.avail_chroma()
    uh, uw = coded.shape

    # availability in 2x2-chroma units (vvenc isAbove/Left/AR/BL-Available)
    above_units = cw >> 1
    left_units = ch >> 1
    above_avail = cy > 0 and _count_avail(
        coded, cx >> 1, (cy - 1) >> 1, above_units, 1, 0, uw, uh) \
        == above_units
    left_avail = cx > 0 and _count_avail(
        coded, (cx - 1) >> 1, cy >> 1, left_units, 0, 1, uw, uh) \
        == left_units
    # for MDLM: above-right / below-left extensions
    ar_units = bl_units = 0
    if above_avail:
        ar_units = _count_avail(coded, (cx + cw) >> 1, (cy - 1) >> 1,
                                above_units, 1, 0, uw, uh)
    if left_avail:
        bl_units = _count_avail(coded, (cx - 1) >> 1, (cy + ch) >> 1,
                                left_units, 0, 1, uw, uh)

    first_ctu_row = (y0 & (ctu_size - 1)) == 0
    ds = _ds_interior(luma, x0, y0, cw, ch, left_avail)

    # template lengths actually used for the model (xGetLMParameters)
    use_above, use_left = above_avail, left_avail
    if mode == MDLM_T_IDX:
        use_left = False
        top_n = 2 * ((cw >> 1) + min(ar_units, ch >> 1)) if above_avail else 0
        left_n = 0
    elif mode == MDLM_L_IDX:
        use_above = False
        left_n = 2 * ((ch >> 1) + min(bl_units, cw >> 1)) if left_avail else 0
        top_n = 0
    else:
        top_n = cw if above_avail else 0
        left_n = ch if left_avail else 0

    above_is4 = 0 if use_left else 1
    left_is4 = 0 if use_above else 1

    sel_luma = [0, 0, 0, 0]
    sel_chroma = [0, 0, 0, 0]
    cnt_t = cnt_l = 0
    if use_above:
        ds_above = _ds_above(luma, x0, y0, top_n, left_avail, first_ctu_row)
        cnt_t = min(top_n, (1 + above_is4) << 1)
        start = top_n >> (2 + above_is4)
        step = max(1, top_n >> (1 + above_is4))
        for k in range(cnt_t):
            pos = start + k * step
            sel_luma[k] = int(ds_above[pos])
            sel_chroma[k] = int(chroma[cy - 1, cx + pos])
    if use_left:
        ds_left = _ds_left(luma, x0, y0, left_n)
        cnt_l = min(left_n, (1 + left_is4) << 1)
        start = left_n >> (2 + left_is4)
        step = max(1, left_n >> (1 + left_is4))
        for k in range(cnt_l):
            pos = start + k * step
            sel_luma[cnt_t + k] = int(ds_left[pos])
            sel_chroma[cnt_t + k] = int(chroma[cy + pos, cx - 1])
    cnt = cnt_t + cnt_l

    if cnt == 2:
        sel_luma[3], sel_chroma[3] = sel_luma[0], sel_chroma[0]
        sel_luma[2], sel_chroma[2] = sel_luma[1], sel_chroma[1]
        sel_luma[0], sel_chroma[0] = sel_luma[1], sel_chroma[1]
        sel_luma[1], sel_chroma[1] = sel_luma[3], sel_chroma[3]

    maxval = (1 << bit_depth) - 1
    if use_above or use_left:
        mn = [0, 2]
        mx = [1, 3]
        if sel_luma[mn[0]] > sel_luma[mn[1]]:
            mn[0], mn[1] = mn[1], mn[0]
        if sel_luma[mx[0]] > sel_luma[mx[1]]:
            mx[0], mx[1] = mx[1], mx[0]
        if sel_luma[mn[0]] > sel_luma[mx[1]]:
            mn, mx = mx, mn
        if sel_luma[mn[1]] > sel_luma[mx[0]]:
            mn[1], mx[0] = mx[0], mn[1]
        min_l = (sel_luma[mn[0]] + sel_luma[mn[1]] + 1) >> 1
        min_c = (sel_chroma[mn[0]] + sel_chroma[mn[1]] + 1) >> 1
        max_l = (sel_luma[mx[0]] + sel_luma[mx[1]] + 1) >> 1
        max_c = (sel_chroma[mx[0]] + sel_chroma[mx[1]] + 1) >> 1
        diff = max_l - min_l
        if diff > 0:
            diff_c = max_c - min_c
            x = diff.bit_length() - 1
            norm_diff = ((diff << 4) >> x) & 15
            v = _DIV_SIG_TABLE[norm_diff] | 8
            x += int(norm_diff != 0)
            y = 0 if diff_c == 0 else abs(diff_c).bit_length()
            add = (1 << y) >> 1
            a = (diff_c * v + add) >> y
            shift = 3 + x - y
            if shift < 1:
                shift = 1
                a = 0 if a == 0 else (-15 if a < 0 else 15)
            b = min_c - ((a * min_l) >> shift)
        else:
            a, b, shift = 0, min_c, 0
    else:
        a, b, shift = 0, 1 << (bit_depth - 1), 0

    pred = ((a * ds) >> shift) + b
    return np.clip(pred, 0, maxval).astype(np.int32)
