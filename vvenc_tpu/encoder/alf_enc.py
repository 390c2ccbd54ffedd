"""ALF encoder: covariance statistics -> Wiener filter derivation ->
per-CTU on/off decisions + APS construction.

Simplified analog of vvenc EncoderLib/EncAdaptiveLoopFilter.cpp (covariance
accumulation getBlkStats:~2000, filter derivation deriveFilter/
xDeriveCoeffQuant, CTU decision xDeriveCtbAlfEnableFlags): we derive one
merged luma filter (all 25 classes) and one chroma filter per picture with
linear clipping (clip idx 0), quantize to the 7-bit fixed-point grid, and
enable per CTU wherever filtering reduces SSE vs the original.
"""

from __future__ import annotations

import numpy as np

from ..codec.alf import (AlfParam, classify_luma, filter_luma_region,
                         filter_chroma_region, reconstruct_luma_coeff,
                         reconstruct_chroma_coeff, NUM_FIXED_FILTER_SETS,
                         _TR7, _TR5)

# geometric tap pair offsets (non-transposed), luma 7x7 then the center
_LUMA_TAPS = [((3, 0), (-3, 0)), ((2, 1), (-2, -1)), ((2, 0), (-2, 0)),
              ((2, -1), (-2, 1)), ((1, 2), (-1, -2)), ((1, 1), (-1, -1)),
              ((1, 0), (-1, 0)), ((1, -1), (-1, 1)), ((1, -2), (-1, 2)),
              ((0, 3), (0, -3)), ((0, 2), (0, -2)), ((0, 1), (0, -1))]
_CHROMA_TAPS = [((2, 0), (-2, 0)), ((1, 1), (-1, -1)), ((1, 0), (-1, 0)),
                ((1, -1), (-1, 1)), ((0, 2), (0, -2)), ((0, 1), (0, -1))]


def _tap_planes(rec: np.ndarray, taps, ctu_size: int, is_chroma: bool,
                halves: bool = False):
    """u_g planes: per geometric tap g, (v0 + v1 - 2*curr) with the ALF
    virtual-boundary clamping per row.  halves=True returns the two
    difference half-planes (v0-curr, v1-curr) separately — the inputs of
    the CLIPPED regression (clip(v0-curr,c)+clip(v1-curr,c)).

    Vectorized over rows: the VB-dependent vertical tap offsets are
    per-row index maps (same construction as codec.alf
    filter_luma_region), so every tap is one fancy-indexed slice."""
    from ..codec.alf import _vb_taps
    h, w = rec.shape
    pad = 3
    sp = np.pad(rec, pad, mode="edge").astype(np.int32)
    vb_pos = ctu_size - (2 if is_chroma else 4)
    n = len(taps)
    planes = np.empty((2 * n if halves else n, h, w), np.int32)
    ys = np.arange(h)
    offs = np.zeros((h, 6), np.int32)
    for i in range(h):
        o1, o2, o3, o4, o5, o6, _ = _vb_taps(i & (ctu_size - 1), vb_pos,
                                             is_chroma)
        offs[i] = (o1, o2, o3, o4, o5, o6)
    omap = {0: np.zeros(h, np.int32), 1: offs[:, 0], -1: offs[:, 1],
            2: offs[:, 2], -2: offs[:, 3], 3: offs[:, 4], -3: offs[:, 5]}
    curr = sp[pad:pad + h, pad:pad + w]
    xs = np.arange(w)
    for g, ((dy0, dx0), (dy1, dx1)) in enumerate(taps):
        v0 = sp[(ys + omap[dy0] + pad)[:, None], (xs + dx0 + pad)[None, :]]
        v1 = sp[(ys + omap[dy1] + pad)[:, None], (xs + dx1 + pad)[None, :]]
        if halves:
            planes[g] = v0 - curr
            planes[n + g] = v1 - curr
        else:
            planes[g] = v0 + v1 - 2 * curr
    return planes


def _clipped_gram_numpy(halves, errf, n_taps, bit_depth):
    """Numpy fallback for the clipped-statistics Gram (native
    vte_alf_stats n_clip=4): clip-major rows k*n_taps+c of
    clip(v0-curr, cv[k]) + clip(v1-curr, cv[k]).

    halves: [2*n_taps, N] (v0-curr rows then v1-curr rows, transpose-
    mapped); errf: [N].  Returns (G [4n,4n], B [4n]) float64."""
    from ..codec.alf import clipping_values
    clips = clipping_values(bit_depth)              # [4] descending
    n_clip = len(clips)
    d0, d1 = halves[:n_taps], halves[n_taps:]
    U = np.empty((n_clip, n_taps, halves.shape[1]), np.float64)
    for c in range(n_clip):
        cv = int(clips[c])
        U[c] = (np.clip(d0, -cv, cv) + np.clip(d1, -cv, cv))
    flat = U.reshape(n_clip * n_taps, -1)
    return flat @ flat.T, flat @ errf


def _derive_clipped(G, B, n_taps, passes=2):
    """Clipped Wiener derivation for one class/filter (vvenc
    EncAdaptiveLoopFilter deriveCoeffQuant with clipping): coordinate
    descent over per-tap clip indices, solving the normal equations of
    clip(v0-curr,c)+clip(v1-curr,c) inputs at each step.

    G: [4*n_taps, 4*n_taps] clip-major Gram; B: [4*n_taps] rhs (from
    vte_alf_stats or _clipped_gram_numpy).  Returns (coeff int32
    [n_taps], clip_idx int32 [n_taps])."""
    n_clip = G.shape[0] // n_taps
    k = np.zeros(n_taps, np.int64)

    def reduction(kv):
        rows = kv * n_taps + np.arange(n_taps)
        A = G[np.ix_(rows, rows)] + np.eye(n_taps) * 1e-7
        b = B[rows]
        try:
            c = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            return -1.0, None
        return float(c @ b), c

    best_red, _ = reduction(k)
    for _ in range(passes):
        changed = False
        for g in range(n_taps):
            for cand in range(n_clip):
                if cand == k[g]:
                    continue
                k2 = k.copy()
                k2[g] = cand
                red, _ = reduction(k2)
                if red > best_red:
                    best_red, k = red, k2
                    changed = True
        if not changed:
            break
    _, csol = reduction(k)
    if csol is None:
        return np.zeros(n_taps, np.int32), np.zeros(n_taps, np.int32)
    q = np.clip(np.round(csol * 128.0), -127, 127).astype(np.int32)
    return q, k.astype(np.int32)


def _ctu_block_sums(plane: np.ndarray, bs: int) -> np.ndarray:
    """Sum a plane over the bs x bs CTU grid (remainder blocks clipped
    at the picture edge): [h_ctus, w_ctus] int64."""
    h, w = plane.shape
    t = np.add.reduceat(plane, np.arange(0, h, bs), axis=0)
    return np.add.reduceat(t, np.arange(0, w, bs), axis=1)


def _solve_quantized(A: np.ndarray, b: np.ndarray, n: int):
    """Solve normal equations and quantize to 7-bit fixed point."""
    try:
        c = np.linalg.solve(A + np.eye(n) * 1e-7, b)
    except np.linalg.LinAlgError:
        return np.zeros(n, np.int32)
    q = np.round(c * 128.0).astype(np.int64)
    return np.clip(q, -127, 127).astype(np.int32)


def derive_alf(orig, rec, bit_depth: int, ctu_size: int, lmbda: float,
               nonlinear: bool = False):
    """Derive ALF parameters + CTU decisions for one picture.

    orig/rec: {comp: plane} (rec = post-deblock pre-ALF).  nonlinear:
    clipped-filter derivation (the slower-preset requirement,
    vvencCfg.cpp:3083; coordinate descent over per-tap clip indices).
    Returns (AlfParam, enabled[3], ctu_flags[3][n], ctu_filter_idx[n],
    ctu_alt[2][n], cls, trn) or None if no gain."""
    h, w = rec[0].shape
    w_ctus = (w + ctu_size - 1) // ctu_size
    h_ctus = (h + ctu_size - 1) // ctu_size
    n_ctus = w_ctus * h_ctus
    cls, trn = classify_luma(rec[0], bit_depth, ctu_size)

    # ---- luma: one Wiener filter per class (25 signalled filters) ----
    # Per-class (clipped) Gram statistics — native one-pass accumulator
    # (vte_alf_stats, the getBlkStats/AdaptiveLoopFilterX86 analog,
    # integer-exact vs the numpy construction) with a numpy fallback.
    from .. import native as _native
    n_clip = 4 if nonlinear else 1
    cmap = np.repeat(np.repeat(cls, 4, 0), 4, 1)[:h, :w].reshape(-1)
    counts = np.bincount(cmap, minlength=25)
    if _native.available():
        GL, BL = _native.alf_stats(rec[0], orig[0], bit_depth, ctu_size,
                                   cls, trn, n_clip)
    else:
        u = _tap_planes(rec[0], _LUMA_TAPS, ctu_size, False,
                        halves=nonlinear)  # (12 or 24, h, w)
        # coefficient-index mapping per pixel transpose:
        # u_coeff[TR[t][g]] = u[g] (gather formulation: uc[c] =
        # u[invTR[t][c]] per pixel, one fancy index instead of 4x12
        # masked scatters)
        tmap = np.repeat(np.repeat(trn, 4, 0), 4, 1)[:h, :w]
        inv_tr = np.empty((4, 12), np.int8)
        for t in range(4):
            for g in range(12):
                inv_tr[t][_TR7[t][g]] = g
        gidx = inv_tr[tmap]                          # [h, w, 12]
        rows = np.moveaxis(gidx, 2, 0)               # [12, h, w] src tap
        yy_, xx_ = np.mgrid[0:h, 0:w]
        uc_parts = [u[rows, yy_[None], xx_[None]]]
        if nonlinear:
            uc_parts.append(u[12 + rows, yy_[None], xx_[None]])
        uc = np.concatenate(uc_parts, axis=0)
        err = (orig[0].astype(np.int64) - rec[0].astype(np.int64))
        flat = uc.reshape(uc.shape[0], -1).astype(np.float64)
        errf = err.reshape(-1).astype(np.float64)
        # class-sorted reordering: per-class pixel sets become
        # contiguous slices (no 25 boolean-mask plane copies)
        order = np.argsort(cmap, kind="stable")
        flat_s = flat[:, order]
        errf_s = errf[order]
        bounds = np.searchsorted(cmap[order], np.arange(26))
        dim = 12 * n_clip
        GL = np.zeros((25, dim, dim), np.float64)
        BL = np.zeros((25, dim), np.float64)
        for c in range(25):
            lo, hi = bounds[c], bounds[c + 1]
            if hi <= lo:
                continue
            if nonlinear:
                GL[c], BL[c] = _clipped_gram_numpy(
                    flat_s[:, lo:hi], errf_s[lo:hi], 12, bit_depth)
            else:
                fc = flat_s[:, lo:hi]
                GL[c] = fc @ fc.T
                BL[c] = fc @ errf_s[lo:hi]
    coeffs = np.zeros((25, 12), np.int32)
    clips = np.zeros((25, 12), np.int32)
    for c in range(25):
        if counts[c] < 64:
            continue
        if nonlinear:
            coeffs[c], clips[c] = _derive_clipped(GL[c], BL[c], 12)
        else:
            coeffs[c] = _solve_quantized(GL[c], BL[c], 12)

    p = AlfParam()
    p.new_filter[0] = 1
    p.num_luma_filters = 25
    p.luma_coeff = coeffs
    p.luma_clip = clips
    p.nonlinear[0] = 1 if (nonlinear and clips.any()) else 0
    p.filter_idx = list(range(25))

    # ---- chroma: one filter for both components ----
    ctu_c = ctu_size >> 1
    if _native.available():
        Gcb, Bcb = _native.alf_stats(rec[1], orig[1], bit_depth, ctu_c,
                                     n_clip=n_clip)
        Gcr, Bcr = _native.alf_stats(rec[2], orig[2], bit_depth, ctu_c,
                                     n_clip=n_clip)
        GC, BC = Gcb[0] + Gcr[0], Bcb[0] + Bcr[0]
    else:
        nch = 12 if nonlinear else 6
        ucb = _tap_planes(rec[1], _CHROMA_TAPS, ctu_c, True,
                          halves=nonlinear)
        ucr = _tap_planes(rec[2], _CHROMA_TAPS, ctu_c, True,
                          halves=nonlinear)
        ecf = np.concatenate(
            [(orig[1].astype(np.int64) - rec[1].astype(np.int64)
              ).reshape(-1),
             (orig[2].astype(np.int64) - rec[2].astype(np.int64)
              ).reshape(-1)]).astype(np.float64)
        flatc = np.concatenate([ucb.reshape(nch, -1),
                                ucr.reshape(nch, -1)],
                               axis=1).astype(np.float64)
        if nonlinear:
            GC, BC = _clipped_gram_numpy(flatc, ecf, 6, bit_depth)
        else:
            GC = flatc @ flatc.T
            BC = flatc @ ecf
    if nonlinear:
        ccq, cclip = _derive_clipped(GC, BC, 6)
        # alternative selection: the quantized clipped filter must beat
        # the quantized LINEAR filter on the filtering error, else keep
        # linear (mirrors the luma alternative gate below).  The linear
        # filter solves the clip-0 (unclipped) Gram block; the errors
        # expand exactly from the Gram: ||e - U^T q/128||^2 =
        # e'e - 2 q.B/128 + q'Gq/128^2.
        lq = _solve_quantized(GC[:6, :6], BC[:6], 6)
        ss_ec = (float(((orig[1].astype(np.int64)
                         - rec[1].astype(np.int64)) ** 2).sum())
                 + float(((orig[2].astype(np.int64)
                           - rec[2].astype(np.int64)) ** 2).sum()))

        def _cerr(q, k):
            rows = np.asarray(k, np.int64) * 6 + np.arange(6)
            qf = q.astype(np.float64) / 128.0
            return (ss_ec - 2.0 * float(qf @ BC[rows])
                    + float(qf @ GC[np.ix_(rows, rows)] @ qf))
        if _cerr(lq, np.zeros(6, np.int64)) <= _cerr(ccq, cclip):
            ccq, cclip = lq, np.zeros(6, np.int32)
    else:
        ccq = _solve_quantized(GC, BC, 6)
        cclip = np.zeros(6, np.int32)
    p.new_filter[1] = 1
    p.num_alts_chroma = 1
    p.chroma_coeff = ccq.reshape(1, 6)
    p.chroma_clip = cclip.reshape(1, 6)
    p.nonlinear[1] = 1 if (nonlinear and cclip.any()) else 0
    p.cc_coeff = np.zeros((2, 4, 7), np.int32)

    if nonlinear:
        # alternative selection (vvenc derives linear AND clipped filter
        # alternatives and RD-picks): keep the clipped set only when it
        # actually filters better than the linear solution — the float
        # training gain does not always survive coefficient quantization
        # linear per-class filters from the clip-0 (unclipped) Gram
        # block — rows k=0 of the clipped statistics ARE the linear
        # statistics since clip value 1<<bit_depth never clips
        lin_coeffs = np.zeros((25, 12), np.int32)
        for c in range(25):
            if counts[c] < 64:
                continue
            lin_coeffs[c] = _solve_quantized(GL[c][:12, :12],
                                             BL[c][:12], 12)
        import copy as _copy
        p_lin = _copy.deepcopy(p)
        p_lin.luma_coeff = lin_coeffs
        p_lin.luma_clip = np.zeros((25, 12), np.int32)
        p_lin.nonlinear[0] = 0

        def _luma_sse(params):
            co, cl = reconstruct_luma_coeff(params, bit_depth)
            out = rec[0].copy()
            filter_luma_region(rec[0], out, 0, 0, w, h, cls, trn, co, cl,
                               bit_depth, ctu_size)
            d = orig[0].astype(np.int64) - out
            return float((d * d).sum())
        if _luma_sse(p_lin) < _luma_sse(p):
            p.luma_coeff = p_lin.luma_coeff
            p.luma_clip = p_lin.luma_clip
            p.nonlinear[0] = 0

    # ---- per-CTU decisions ----
    coeff_l, clip_l = reconstruct_luma_coeff(p, bit_depth)
    coeff_c, clip_c = reconstruct_chroma_coeff(p, 0, bit_depth)
    filt = {0: rec[0].copy(), 1: rec[1].copy(), 2: rec[2].copy()}
    filter_luma_region(rec[0], filt[0], 0, 0, w, h, cls, trn, coeff_l,
                       clip_l, bit_depth, ctu_size)
    for comp in (1, 2):
        filter_chroma_region(rec[comp], filt[comp], 0, 0, w >> 1, h >> 1,
                             coeff_c, clip_c, bit_depth, ctu_c)
    ctu_flags = np.zeros((3, n_ctus), np.int32)
    ctu_fidx = np.full(n_ctus, NUM_FIXED_FILTER_SETS, np.int32)
    ctu_alt = np.zeros((2, n_ctus), np.int32)
    flag_cost = lmbda * 2.0  # ~rate of the enable flag + filter idx
    total_gain = 0.0
    for comp in range(3):
        sc = 1 if comp else 0
        bs = ctu_size >> sc
        d_off = _ctu_block_sums(
            (orig[comp].astype(np.int64) - rec[comp]) ** 2, bs)
        d_on = _ctu_block_sums(
            (orig[comp].astype(np.int64) - filt[comp]) ** 2, bs)
        on = d_on + flag_cost < d_off
        ctu_flags[comp] = on.reshape(-1)
        total_gain += (float((d_off - d_on)[on].sum())
                       - flag_cost * int(on.sum()))
    enabled = [int(ctu_flags[c].any()) for c in range(3)]
    if not any(enabled):
        return None
    # picture-level gate: the APS must pay for itself (vvenc accounts the
    # filter-signalling rate inside the ALF RD; without this, high-TL
    # pictures with ~200-bit budgets were spending 1-2 kbit on an APS
    # for marginal gains).  The APS cost is the real serialized size.
    from ..bitstream.hls import BitWriter
    from ..codec.alf import write_alf_aps
    bw = BitWriter()
    write_alf_aps(bw, 0, p)
    aps_bits = len(bw.get_bytes()) * 8 + 48  # + NAL header/EBSP overhead
    if total_gain <= lmbda * aps_bits:
        return None
    # luma-disabled CTUs keep fidx; chroma uses alternative 0
    return p, enabled, ctu_flags, ctu_fidx, ctu_alt, filt


# ---------------------------------------------------------------------------
# CC-ALF (cross-component ALF) encoder
# ---------------------------------------------------------------------------

def _cc_tap_planes(luma: np.ndarray, hc: int, wc: int, ctu_size: int):
    """7 tap-difference planes of the 3x4 luma diamond sampled at chroma
    positions (mirror of codec.alf.filter_ccalf_region geometry incl. the
    virtual-boundary offsets)."""
    pad = 2
    lp = np.pad(luma, pad, mode="edge").astype(np.int32)
    vb_pos = ctu_size - 4
    lx = np.arange(wc) << 1
    ly = np.arange(hc) << 1
    pos = ly & (ctu_size - 1)
    off1 = np.ones(hc, np.int32)
    off2 = -np.ones(hc, np.int32)
    off3 = np.full(hc, 2, np.int32)
    m3 = (pos == vb_pos - 2) | (pos == vb_pos + 1)
    off3[m3] = off1[m3]
    m0 = (pos == vb_pos - 1) | (pos == vb_pos)
    off1[m0] = off2[m0] = off3[m0] = 0
    ry = (ly + pad)[:, None]
    rx = (lx + pad)[None, :]
    curr = lp[ry, rx]
    planes = np.empty((7, hc, wc), np.int32)
    planes[0] = lp[(ly + off2 + pad)[:, None], rx] - curr
    planes[1] = lp[ry, rx - 1] - curr
    planes[2] = lp[ry, rx + 1] - curr
    o1 = (ly + off1 + pad)[:, None]
    planes[3] = lp[o1, rx - 1] - curr
    planes[4] = lp[o1, rx] - curr
    planes[5] = lp[o1, rx + 1] - curr
    planes[6] = lp[(ly + off3 + pad)[:, None], rx] - curr
    return planes


def _quant_pow2(v: float) -> int:
    """Nearest CC-ALF-legal coefficient: 0 or +-2^k, k in 0..6
    (1/128 fixed point; the APS codes 1 + log2|c| and a sign)."""
    q = v * 128.0
    cands = [0] + [s * (1 << k) for k in range(7) for s in (1, -1)]
    return min(cands, key=lambda c: abs(q - c))


def derive_ccalf(orig, applied, luma_pre, bit_depth: int, ctu_size: int,
                 lmbda: float):
    """Derive one CC-ALF filter per chroma component.

    orig: {comp: plane} originals; applied: {1,2} ALF-filtered chroma;
    luma_pre: post-SAO pre-ALF luma (the CC filter's input).
    Returns (cc_coeff[2,4,7], counts[2], enabled[2], cc_ctrl[2,n]) or
    None when neither component gains."""
    from ..codec.alf import filter_ccalf_region
    hc, wc = applied[1].shape
    planes = _cc_tap_planes(luma_pre, hc, wc, ctu_size)
    flat = planes.reshape(7, -1).astype(np.float64)
    ctu_c = ctu_size >> 1
    w_ctus = (wc + ctu_c - 1) // ctu_c
    h_ctus = (hc + ctu_c - 1) // ctu_c
    n = w_ctus * h_ctus
    cc_coeff = np.zeros((2, 4, 7), np.int32)
    cc_ctrl = np.zeros((2, n), np.int32)
    enabled = [0, 0]
    for cc in range(2):
        comp = cc + 1
        err = (orig[comp].astype(np.int64)
               - applied[comp].astype(np.int64)).reshape(-1)
        A = flat @ flat.T
        b = flat @ err.astype(np.float64)
        try:
            c = np.linalg.solve(A + np.eye(7) * 1e-6, b)
        except np.linalg.LinAlgError:
            continue
        coeff = np.array([_quant_pow2(v) for v in c], np.int32)
        if not coeff.any():
            continue
        # filtered candidate plane
        cand = applied[comp].copy()
        filter_ccalf_region(luma_pre, cand, 0, 0, wc, hc, coeff,
                            bit_depth, ctu_size)
        # per-CTU on/off
        d_off = _ctu_block_sums(
            (orig[comp].astype(np.int64) - applied[comp]) ** 2, ctu_c)
        d_on = _ctu_block_sums(
            (orig[comp].astype(np.int64) - cand) ** 2, ctu_c)
        on = d_on + lmbda * 2.0 < d_off
        cc_ctrl[cc] = on.reshape(-1)  # filter idc 1
        any_on = bool(on.any())
        if any_on:
            enabled[cc] = 1
            cc_coeff[cc][0] = coeff
    if not any(enabled):
        return None
    return cc_coeff, [1 if enabled[c] else 0 for c in range(2)], \
        enabled, cc_ctrl
