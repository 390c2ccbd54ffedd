"""SAO encoder: per-CTU statistics, offset derivation, RD mode decision.

Structural analog of vvenc EncoderLib/EncSampleAdaptiveOffset.{h,cpp}
(EncSampleAdaptiveOffset.h:90, SAOStatData :61): for each CTU and component
we accumulate (count, sum-of-error) per EO class/category and per BO band
from the deblocked reconstruction against the original, derive the RD-best
offsets per candidate mode, then choose OFF / best-EO / best-BO / merge-left
/ merge-up by distortion-delta + estimated bits.  Chroma (Cb/Cr) shares the
mode and EO class, as the syntax requires (sao.py write path, comp 2
inherits from comp 1).

Distortion model (vvenc EncSampleAdaptiveOffset::estSaoDist): applying
offset ``a`` to N samples whose error sum is E = sum(orig - rec) changes the
SSE by  dD = N*a^2 - 2*a*E.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..codec.sao import (SAO_OFF, SAO_BO, SAO_EO, SaoBlkParam, SaoCompParam,
                         NUM_BO_CLASSES, _EO_DIRS, _EO_CAT_MAP,
                         _max_offset_qval)


def _eo_stats(rec: np.ndarray, org: np.ndarray, x0, y0, x1, y1, eo_class,
              w, h):
    """(count, err-sum) per EO category 1..4 for one CTU region.

    Only samples whose two neighbors lie inside the picture participate
    (same valid window as apply_sao_picture)."""
    (dx0, dy0), (dx1, dy1) = _EO_DIRS[eo_class]
    vx0 = max(x0, -min(dx0, dx1, 0))
    vy0 = max(y0, -min(dy0, dy1, 0))
    vx1 = min(x1, w - max(dx0, dx1, 0))
    vy1 = min(y1, h - max(dy0, dy1, 0))
    cnt = np.zeros(5, np.int64)
    err = np.zeros(5, np.int64)
    if vx1 <= vx0 or vy1 <= vy0:
        return cnt, err
    c = rec[vy0:vy1, vx0:vx1].astype(np.int32)
    n0 = rec[vy0 + dy0:vy1 + dy0, vx0 + dx0:vx1 + dx0].astype(np.int32)
    n1 = rec[vy0 + dy1:vy1 + dy1, vx0 + dx1:vx1 + dx1].astype(np.int32)
    cat = _EO_CAT_MAP[2 + np.sign(c - n0) + np.sign(c - n1)]
    diff = org[vy0:vy1, vx0:vx1].astype(np.int64) - c
    for k in range(1, 5):
        m = cat == k
        cnt[k] = int(m.sum())
        err[k] = int(diff[m].sum())
    return cnt, err


def _bo_stats(rec: np.ndarray, org: np.ndarray, x0, y0, x1, y1,
              bit_depth: int):
    """(count, err-sum) per band (32 bands) for one CTU region."""
    c = rec[y0:y1, x0:x1].astype(np.int32)
    band = (c >> (bit_depth - 5)).ravel()
    diff = (org[y0:y1, x0:x1].astype(np.int64) - c).ravel()
    cnt = np.bincount(band, minlength=NUM_BO_CLASSES).astype(np.int64)
    err = np.bincount(band, weights=diff,
                      minlength=NUM_BO_CLASSES).astype(np.int64)
    return cnt, err


def _best_offset(cnt: int, err: int, cmax: int, lmbda: float,
                 allow_neg: bool) -> Tuple[int, float]:
    """RD-best offset for one class: start at round(E/N), shrink toward 0.

    Returns (offset, rd_cost) where rd_cost = dD + lmbda * offset_bits
    (truncated-unary magnitude + sign for BO).  vvenc
    EncSampleAdaptiveOffset::estIterOffset analog."""
    if cnt == 0:
        return 0, 0.0
    off = int(round(err / cnt))
    off = max(-cmax if allow_neg else 0, min(cmax, off))
    best = (0, 0.0)
    step = -1 if off > 0 else 1
    while off != 0:
        d = cnt * off * off - 2 * off * err
        bits = min(abs(off) + 1, cmax + 1) + (1 if allow_neg and off else 0)
        cost = d + lmbda * bits
        if cost < best[1]:
            best = (off, cost)
        off += step
    return best


def _eo_cost(stats, eo_class, cmax, lmbda):
    """Best offsets + rd-cost for one EO class of one component."""
    cnt, err = stats[eo_class]
    offs = [0, 0, 0, 0]
    cost = 0.0
    for k in range(1, 5):
        # categories 3/4 are applied negated: the applied value is -h for
        # coded magnitude h, so derive on negated error sum
        e = err[k] if k <= 2 else -err[k]
        o, c = _best_offset(int(cnt[k]), int(e), cmax, lmbda, False)
        offs[k - 1] = o
        cost += c
    return offs, cost


def _bo_cost(stats_bo, cmax, lmbda):
    """Best 4-consecutive-band choice for BO (non-wrapping band_pos)."""
    cnt, err = stats_bo
    per_band = [(0, 0.0)] * NUM_BO_CLASSES
    for b in range(NUM_BO_CLASSES):
        per_band[b] = _best_offset(int(cnt[b]), int(err[b]), cmax, lmbda,
                                   True)
    best = (0, [0, 0, 0, 0], 0.0)
    for pos in range(NUM_BO_CLASSES - 3):
        offs = [per_band[pos + i][0] for i in range(4)]
        cost = sum(per_band[pos + i][1] for i in range(4))
        if cost < best[2]:
            best = (pos, offs, cost)
    return best


def _dist_with_params(stats_eo, stats_bo, p: SaoCompParam) -> float:
    """SSE delta of applying the given (possibly merged) params."""
    if p.mode == SAO_OFF:
        return 0.0
    d = 0.0
    if p.mode == SAO_EO:
        cnt, err = stats_eo[p.eo_class]
        for k in range(1, 5):
            a = p.offsets[k - 1] if k <= 2 else -p.offsets[k - 1]
            d += cnt[k] * a * a - 2 * a * err[k]
    else:
        cnt, err = stats_bo
        for i in range(4):
            b = (p.band_pos + i) % NUM_BO_CLASSES
            a = p.offsets[i]
            d += cnt[b] * a * a - 2 * a * err[b]
    return d


def _param_bits(p: SaoCompParam, cmax: int, first_of_ch: bool) -> float:
    """Approximate signaled bits for one component's params."""
    if not first_of_ch:
        # second chroma comp: only offsets (+signs/band_pos for BO)
        bits = 0.0
    else:
        bits = 1.0  # SaoTypeIdx ctx bin
        if p.mode != SAO_OFF:
            bits += 1.0  # EO/BO ep bin
    if p.mode == SAO_OFF:
        return bits
    for o in p.offsets:
        bits += min(abs(o) + 1, cmax + 1)
    if p.mode == SAO_BO:
        bits += sum(1 for o in p.offsets if o) + 5
    elif first_of_ch:
        bits += 2
    return bits


def _picture_stats(src, rec, bit_depth: int, ctu_size: int, n_cols: int,
                   n_rows: int):
    """Whole-picture SAO statistics reduced per CTU in one pass.

    Replaces the per-CTU-region _eo_stats/_bo_stats calls (336 small
    numpy invocations per 416x240 frame) with 5 bincounts per component
    over flat (ctu_index, category) keys — identical numbers.

    Returns (stats_eo, stats_bo): stats_eo[comp][ec] = (cnt, err) arrays
    [n_ctus, 5]; stats_bo[comp] = (cnt, err) [n_ctus, 32]."""
    n_ctus = n_cols * n_rows
    stats_eo = [[None] * 4 for _ in range(3)]
    stats_bo = [None] * 3
    from .. import native as _native
    if _native.available():
        # one C++ pass per component (vte_sao_stats), identical numbers
        for comp in range(3):
            cs_ = ctu_size >> (1 if comp else 0)
            eo_cnt, eo_err, bo_cnt, bo_err = _native.sao_stats(
                rec[comp], src[comp], bit_depth, cs_, n_cols, n_rows)
            for ec in range(4):
                stats_eo[comp][ec] = (eo_cnt[ec], eo_err[ec])
            stats_bo[comp] = (bo_cnt, bo_err)
        return stats_eo, stats_bo
    for comp in range(3):
        sc = 1 if comp else 0
        cs_ = ctu_size >> sc
        h, w = rec[comp].shape
        c = rec[comp].astype(np.int32)
        diff = src[comp].astype(np.int64) - c
        yy = np.arange(h) // cs_
        xx = np.arange(w) // cs_
        ctu_of = (yy[:, None] * n_cols + xx[None, :]).ravel()
        for ec in range(4):
            (dx0, dy0), (dx1, dy1) = _EO_DIRS[ec]
            vx0 = -min(dx0, dx1, 0)
            vy0 = -min(dy0, dy1, 0)
            vx1 = w - max(dx0, dx1, 0)
            vy1 = h - max(dy0, dy1, 0)
            cat = np.zeros((h, w), np.int64)
            cc = c[vy0:vy1, vx0:vx1]
            n0 = c[vy0 + dy0:vy1 + dy0, vx0 + dx0:vx1 + dx0]
            n1 = c[vy0 + dy1:vy1 + dy1, vx0 + dx1:vx1 + dx1]
            cat[vy0:vy1, vx0:vx1] = _EO_CAT_MAP[2 + np.sign(cc - n0)
                                                + np.sign(cc - n1)]
            key = ctu_of * 5 + cat.ravel()
            cnt = np.bincount(key, minlength=n_ctus * 5) \
                .reshape(n_ctus, 5)
            err = np.bincount(key, weights=diff.ravel(),
                              minlength=n_ctus * 5).reshape(n_ctus, 5)
            # border pixels were assigned category 0 (unused)
            stats_eo[comp][ec] = (cnt.astype(np.int64),
                                  err.astype(np.int64))
        band = (c >> (bit_depth - 5)).ravel()
        key = ctu_of * NUM_BO_CLASSES + band
        cnt = np.bincount(key, minlength=n_ctus * NUM_BO_CLASSES) \
            .reshape(n_ctus, NUM_BO_CLASSES)
        err = np.bincount(key, weights=diff.ravel(),
                          minlength=n_ctus * NUM_BO_CLASSES) \
            .reshape(n_ctus, NUM_BO_CLASSES)
        stats_bo[comp] = (cnt.astype(np.int64), err.astype(np.int64))
    return stats_eo, stats_bo


def _best_offset_vec(cnt, err, cmax: int, lmbda: float, allow_neg: bool):
    """Vectorized _best_offset over trailing axes: returns (off, cost)
    arrays of cnt's shape — identical to the scalar shrink-toward-zero
    search (all candidates on the walk are evaluated)."""
    cnt = cnt.astype(np.float64)
    err = err.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        off0 = np.where(cnt > 0, np.round(err / np.maximum(cnt, 1)), 0.0)
    lo = -cmax if allow_neg else 0
    off0 = np.clip(off0, lo, cmax)
    # candidates ordered by DESCENDING |o| per sign so argmin's
    # first-minimal tie-break matches the scalar walk (which keeps the
    # larger-|offset| candidate on equal cost)
    o = np.concatenate([np.arange(-cmax, 0), np.arange(cmax, 0, -1)]) \
        .astype(np.float64)                              # [14]
    oshape = (1,) * cnt.ndim + (-1,)
    o = o.reshape(oshape)
    c = cnt[..., None]
    e = err[..., None]
    valid = (o != 0) & (np.abs(o) <= np.abs(off0[..., None])) & \
        (o * off0[..., None] > 0)
    d = c * o * o - 2.0 * o * e
    bits = np.minimum(np.abs(o) + 1, cmax + 1) + (1.0 if allow_neg else 0.0)
    cost = np.where(valid, d + lmbda * bits, np.inf)
    amin = np.argmin(cost, axis=-1)
    best_cost = np.take_along_axis(cost, amin[..., None], -1)[..., 0]
    best_off = np.take_along_axis(np.broadcast_to(o, cost.shape),
                                  amin[..., None], -1)[..., 0]
    pick = best_cost < 0.0
    return np.where(pick, best_off, 0.0).astype(np.int64), \
        np.where(pick, best_cost, 0.0)


def derive_sao(src, rec, bit_depth: int, ctu_size: int, lmbda: float,
               n_cols: int, n_rows: int,
               tile_of=None) -> Optional[List[SaoBlkParam]]:
    """Derive per-CTU SAO params from deblocked rec vs original.

    Returns (sao_map, (luma_on, chroma_on)) or None if SAO is all-off.
    rec is NOT modified (caller applies via apply_sao_picture)."""
    cmax = _max_offset_qval(bit_depth)
    sao_map: List[Optional[SaoBlkParam]] = [None] * (n_cols * n_rows)
    lmb = [lmbda, lmbda, lmbda]
    any_on = [False, False]
    pic_eo, pic_bo = _picture_stats(src, rec, bit_depth, ctu_size,
                                    n_cols, n_rows)
    # picture-wide vectorized offset derivation (replaces the per-CTU
    # _best_offset walks: 40k scalar calls per frame)
    eo_off = [None] * 3    # [n_ctus, 4cls, 4cat]
    eo_cost = [None] * 3   # [n_ctus, 4cls]
    bo_pos = [None] * 3    # [n_ctus]
    bo_off = [None] * 3    # [n_ctus, 4]
    bo_cost = [None] * 3   # [n_ctus]
    for comp in range(3):
        cnt = np.stack([pic_eo[comp][ec][0][:, 1:5] for ec in range(4)], 1)
        err = np.stack([pic_eo[comp][ec][1][:, 1:5] for ec in range(4)], 1)
        err = err * np.array([1, 1, -1, -1])[None, None, :]
        offs, costs = _best_offset_vec(cnt, err, cmax, lmb[comp], False)
        eo_off[comp] = offs
        eo_cost[comp] = costs.sum(axis=2)
        bcnt, berr = pic_bo[comp]
        boffs, bcosts = _best_offset_vec(bcnt, berr, cmax, lmb[comp], True)
        # best 4-consecutive-band window (non-wrapping)
        wins = np.stack([bcosts[:, p:p + 4].sum(axis=1)
                         for p in range(NUM_BO_CLASSES - 3)], 1)
        pos = np.argmin(wins, axis=1)
        best = np.take_along_axis(wins, pos[:, None], 1)[:, 0]
        use = best < 0.0
        bo_pos[comp] = np.where(use, pos, 0)
        bo_cost[comp] = np.where(use, best, 0.0)
        bo_off[comp] = np.stack(
            [np.take_along_axis(boffs, (bo_pos[comp] + i)[:, None], 1)[:, 0]
             for i in range(4)], 1)
        bo_off[comp][~use] = 0
    for ry in range(n_rows):
        for rx in range(n_cols):
            idx = ry * n_cols + rx
            stats_eo = [[(pic_eo[comp][ec][0][idx], pic_eo[comp][ec][1][idx])
                         for ec in range(4)] for comp in range(3)]
            stats_bo = [(pic_bo[comp][0][idx], pic_bo[comp][1][idx])
                        for comp in range(3)]

            # luma decision: OFF vs best EO vs best BO
            def comp_best(comp, joint_with=None):
                """Best new params for a channel.  joint_with: for chroma,
                the decision covers comps (1,2) jointly."""
                comps = [comp] if joint_with is None else [comp, joint_with]
                best = ([SaoCompParam() for _ in comps], 0.0)
                # EO classes
                for ec in range(4):
                    ps, cost = [], 0.0
                    for ci, c in enumerate(comps):
                        offs = eo_off[c][idx, ec].tolist()
                        p = SaoCompParam(SAO_EO, ec, 0, offs)
                        ps.append(p)
                        cost += float(eo_cost[c][idx, ec])
                    if all(not any(p.offsets) for p in ps):
                        continue
                    cost += lmb[comps[0]] * sum(
                        _param_bits(p, cmax, i == 0)
                        for i, p in enumerate(ps))
                    if cost < best[1]:
                        best = (ps, cost)
                # BO
                ps, cost = [], 0.0
                for c in comps:
                    p = SaoCompParam(SAO_BO, 0, int(bo_pos[c][idx]),
                                     bo_off[c][idx].tolist())
                    ps.append(p)
                    cost += float(bo_cost[c][idx])
                if any(any(p.offsets) for p in ps):
                    cost += lmb[comps[0]] * sum(
                        _param_bits(p, cmax, i == 0)
                        for i, p in enumerate(ps))
                    if cost < best[1]:
                        best = (ps, cost)
                return best

            new_blk = SaoBlkParam()
            ly, cost_y = comp_best(0)
            new_blk.comps[0] = ly[0]
            cc, cost_c = comp_best(1, joint_with=2)
            new_blk.comps[1], new_blk.comps[2] = cc[0], cc[1]
            # merge availability stops at tile boundaries
            has_left = rx > 0 and (tile_of is None
                                   or tile_of[idx - 1] == tile_of[idx])
            has_up = ry > 0 and (tile_of is None
                                 or tile_of[idx - n_cols] == tile_of[idx])
            new_cost = cost_y + cost_c + lmb[0] * (
                (1 if has_left else 0) + (1 if has_up else 0))

            # merge candidates: whole-blk reuse of left / above params
            cands = [(new_cost, new_blk)]
            for mi, nb in ((0, idx - 1 if has_left else -1),
                           (1, idx - n_cols if has_up else -1)):
                if nb < 0 or sao_map[nb] is None:
                    continue
                mb = sao_map[nb]
                d = sum(_dist_with_params(stats_eo[c], stats_bo[c],
                                          mb.comps[c]) for c in range(3))
                bits = 1.0 + (1.0 if mi == 1 and has_left else 0.0)
                cands.append((d + lmb[0] * bits, mb))
            cands.sort(key=lambda t: t[0])
            blk = cands[0][1]
            sao_map[idx] = blk
            if blk.comps[0].mode != SAO_OFF:
                any_on[0] = True
            if blk.comps[1].mode != SAO_OFF or blk.comps[2].mode != SAO_OFF:
                any_on[1] = True
    if not (any_on[0] or any_on[1]):
        return None
    return sao_map, (1 if any_on[0] else 0, 1 if any_on[1] else 0)
