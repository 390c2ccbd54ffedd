"""Inter (P/B-slice) CU search: merge/skip, MMVD, GEO, CIIP, SBT,
affine, SbTMVP, SMVD, BCW, AMVR trials + hierarchical motion search.

Mixin of _CtuSearcher (encoder/intra_encoder.py) — split out of the
searcher monolith; every method runs with the searcher's state (self.ps,
self.coder, self.est, ...).  Reference analogs: vvenc
EncoderLib/EncCu.cpp mode loop (:717), InterSearch.cpp (xMergeEstimation,
xEstimateMvPredAMVP, xTZSearch inversion via the dense-grid hierarchical
search), and the per-tool trial stages cited inline.
"""

from __future__ import annotations

import numpy as np

from ..bitstream import ctx_tables as ct
from ..codec.ctu_syntax import (CuData, PartInfo, TreeNode, get_intra_mpms,
                                inter_predict, predict_cu_component,
                                reconstruct_cu)
from ..codec.motion import get_amvp_candidates, get_merge_candidates
from ..codec.picture import PictureState
from ..ops import intra as I
from ..ops import intra_vec as IV
from ..ops import rdcost as R
from ..ops import transforms as T
from ..ops.interp import mc_block_np
from ..utils.searchspace import bump as _ss_bump


class InterSearchMixin:
    """Inter-slice CU decision + motion search methods of _CtuSearcher."""

    def _rd_cu_inter(self, x: int, y: int, w: int, h: int, part: PartInfo):
        """P-slice CU decision: skip/merge, AMVP ME, and intra fallback.

        Each trial is applied through the real syntax writer driven by the
        bit estimator (exact context modeling), then reverted; the winner's
        state is kept."""
        import numpy as _np
        coder = self.coder
        ps = self.ps
        cfg = self.cfg
        bit_depth = cfg.bit_depth
        sps = self.enc.sps
        src_y = self.src[0][y:y + h, x:x + w]
        cx, cy2, cw, chh = x >> 1, y >> 1, w >> 1, h >> 1
        src_cb = self.src[1][cy2:cy2 + chh, cx:cx + cw]
        src_cr = self.src[2][cy2:cy2 + chh, cx:cx + cw]
        # LMCS: ME/preselection compare unmapped predictions against the
        # unmapped source; residuals form in the mapped domain
        src_me = self.src_me_y[y:y + h, x:x + w]
        lmcs_map = coder.lmcs_ctu_flag
        cscale = self._chroma_scale(x, y, cw, chh)

        is_b = coder.is_b
        merge_cands = get_merge_candidates(
            ps, coder.mf, coder.hmvp, x, y, w, h, sps.max_num_merge_cand,
            is_b, coder.num_refs, coder.tmvp)

        def mc_pred(mv_pair, ref_idx):
            py = inter_predict(coder.ref_pics, mv_pair, ref_idx, x, y, w, h,
                               0, bit_depth)
            pcb = inter_predict(coder.ref_pics, mv_pair, ref_idx, cx, cy2,
                                cw, chh, 1, bit_depth)
            pcr = inter_predict(coder.ref_pics, mv_pair, ref_idx, cx, cy2,
                                cw, chh, 2, bit_depth)
            return py, pcb, pcr

        # preselect merge candidates by luma SSE
        from .ifp import mv_access_ok
        scored = []
        seen = set()
        for idx, mi in enumerate(merge_cands):
            key = (mi.mv, mi.ref_idx)
            if key in seen:
                continue
            seen.add(key)
            if not mv_access_ok(None, self.ifp_bottom, y, h,
                                mv_pair=mi.mv, ref_idx=mi.ref_idx):
                continue   # IFP: reads below the reference window
            py = inter_predict(coder.ref_pics, mi.mv, mi.ref_idx, x, y, w, h,
                               0, bit_depth)
            scored.append((R.sse_np(src_me, py), idx, mi))
        scored.sort(key=lambda t: t[0])

        trials = []
        qy = self.qp.luma_qp()

        def add_resid_trial(cu, try_sbt=False):
            """Residual trial: prediction through the real decoder path
            (DMVR/BDOF/CIIP/BCW included) so coefficients match what the
            reconstruction will subtract.  try_sbt adds sub-block-transform
            variants (half splits) of the same prediction."""
            coder.prepare_refinement(ps, cu)
            py = coder.pred_cu_inter(ps, cu, 0, mapped=True)
            pcb = coder.pred_cu_inter(ps, cu, 1)
            pcr = coder.pred_cu_inter(ps, cu, 2)
            if w > 64 or h > 64:
                # >maxTB CU: implicit 64x64 TU tiling
                added = self._quant_resid_mtb(cu, src_y, src_cb, src_cr,
                                              py, pcb, pcr)
                if added:
                    trials.append(cu)
                return added
            coeffs = self._quant_resid(src_y, src_cb, src_cr, py, pcb, pcr,
                                       cscale=cscale)
            added = False
            if coeffs[0] is not None:
                cu.coeff_y, cu.coeff_cb, cu.coeff_cr = coeffs
                cu.root_cbf = True
                trials.append(cu)
                added = True
            if try_sbt:
                allowed = coder._sbt_allowed_bits(cu)
                if allowed:
                    self._add_sbt_trials(cu, allowed, src_y - py,
                                         src_cb - pcb, src_cr - pcr, trials)
            return added

        for _, idx, mi in scored[:2]:
            # skip trial (no residual); _apply_merge fills mv/ref/bcw/
            # alt-hpel exactly as the decoder will
            cu = CuData(x, y, w, h, is_inter=True, skip=True, merge=True,
                        merge_idx=idx, root_cbf=False)
            coder._apply_merge(ps, cu)
            trials.append(cu)
            cu = CuData(x, y, w, h, is_inter=True, merge=True,
                        merge_idx=idx)
            coder._apply_merge(ps, cu)
            add_resid_trial(cu, try_sbt=True)

        # FIM-style early out (vvenc FastInferMerge, EncCu.cpp:3119 +
        # InterSearch.cpp:1168: at the faster presets the expensive mode
        # families are skipped when merge already predicts well): when
        # NO top-merge candidate coded any residual — the merge
        # prediction quantizes to zero in every component — MMVD, the
        # subblock/affine merges, GEO and the AMVP motion search cannot
        # plausibly beat the zero-cost skip and are not generated.
        merge_perfect = (self.enc.trial_filter is None and bool(scored)
                         and not any(t.root_cbf for t in trials))
        if merge_perfect:

            import os as _os
            if _os.environ.get("VTE_DBG_TRIALS"):
                import sys as _sys
                ks = []
                for t in trials:
                    ks.append("%s%s%s%s%s%s%s mv%s r%s" % (
                        "S" if t.skip else "", "M" if t.merge else "",
                        "V" if t.mmvd_flag else "", "G" if t.geo else "",
                        "A" if t.affine else "", "D" if t.smvd else "",
                        "I" if t.imv else "", t.mv, t.ref_idx))
                print(f"PYTRIALS ({x},{y} {w}x{h}) n={len(trials)} " +
                      " | ".join(ks), file=_sys.stderr)
            return self._finish_inter_trials(
                x, y, w, h, part, trials, src_y, src_cb, src_cr, cscale,
                qy, cx, cy2, cw, chh)

        # CIIP trial on the best merge candidate
        if scored:
            from ..codec.geo import ciip_available
            probe = CuData(x, y, w, h, is_inter=True, merge=True, ciip=True,
                           merge_idx=scored[0][1])
            if ciip_available(coder, probe):
                coder._apply_merge(ps, probe)
                add_resid_trial(probe)

        # MMVD trials: offsets around the first merge bases; luma-SSE
        # preselection over (base, step, pos), full trial for the winner
        if coder.mmvd and scored:
            best_m = None
            n_base = 2 if sps.max_num_merge_cand > 1 else 1
            for base in range(n_base):
                for step in range(3):
                    for pos_ in range(4):
                        cu = CuData(x, y, w, h, is_inter=True, merge=True,
                                    mmvd_flag=True, mmvd_base=base,
                                    mmvd_step=step, mmvd_pos=pos_)
                        coder._apply_mmvd(ps, cu)
                        if not mv_access_ok(cu, self.ifp_bottom, y, h):
                            continue
                        py = inter_predict(coder.ref_pics, cu.mv,
                                           cu.ref_idx, x, y, w, h, 0,
                                           bit_depth, cu.bcw_idx,
                                           cu.alt_hpel)
                        c = R.sse_np(src_me, py)
                        if best_m is None or c < best_m[0]:
                            best_m = (c, cu)
            if best_m is not None:
                cu = best_m[1]
                skip_cu = CuData(x, y, w, h, is_inter=True, skip=True,
                                 merge=True, mmvd_flag=True,
                                 mmvd_base=cu.mmvd_base,
                                 mmvd_step=cu.mmvd_step,
                                 mmvd_pos=cu.mmvd_pos, root_cbf=False)
                coder._apply_mmvd(ps, skip_cu)
                trials.append(skip_cu)
                add_resid_trial(cu)

        # subblock merge trials: SbTMVP (candidate 0 when active) + affine
        # merge candidates, luma-SSE preselected
        if coder.max_aff_merge > 0 and w >= 8 and h >= 8:
            n_try = min(coder.max_aff_merge,
                        3 if coder.affine_en else 1)
            best_a = None
            for k in range(n_try):
                cu = CuData(x, y, w, h, is_inter=True, merge=True,
                            affine=True, merge_idx=k)
                coder._apply_affine_merge(ps, cu)
                if not mv_access_ok(cu, self.ifp_bottom, y, h):
                    continue
                c = R.sse_np(src_me, coder.pred_cu_inter(ps, cu, 0))
                if best_a is None or c < best_a[0]:
                    best_a = (c, k)
            if best_a is not None:
                k = best_a[1]
                skip_cu = CuData(x, y, w, h, is_inter=True, skip=True,
                                 merge=True, affine=True, merge_idx=k,
                                 root_cbf=False)
                coder._apply_affine_merge(ps, skip_cu)
                trials.append(skip_cu)
                cu = CuData(x, y, w, h, is_inter=True, merge=True,
                            affine=True, merge_idx=k)
                coder._apply_affine_merge(ps, cu)
                add_resid_trial(cu)

        # GEO trials: luma-SSE preselection over split directions x the
        # first uni candidate pairs, skip + residual variants of the winner
        if coder.geo_en and is_b:
            from ..codec.geo import geo_available, geo_predict
            probe = CuData(x, y, w, h, is_inter=True, merge=True, geo=True,
                           geo_split_dir=0, geo_idx0=0, geo_idx1=1)
            best_g = None
            if geo_available(coder, probe):
                pairs = [(0, 1), (1, 0)]
                if coder.max_geo_cand > 2:
                    pairs += [(0, 2), (2, 0)]
                for sd in range(0, 64, 4):
                    for i0, i1 in pairs:
                        cu = CuData(x, y, w, h, is_inter=True, merge=True,
                                    geo=True, geo_split_dir=sd,
                                    geo_idx0=i0, geo_idx1=i1)
                        coder._apply_geo(ps, cu)
                        if not mv_access_ok(cu, self.ifp_bottom, y, h):
                            continue
                        c = R.sse_np(src_me, geo_predict(coder, cu, 0))
                        if best_g is None or c < best_g[0]:
                            best_g = (c, sd, i0, i1)
            if best_g is not None:
                _, sd, i0, i1 = best_g
                skip_cu = CuData(x, y, w, h, is_inter=True, skip=True,
                                 merge=True, geo=True, geo_split_dir=sd,
                                 geo_idx0=i0, geo_idx1=i1, root_cbf=False)
                coder._apply_geo(ps, skip_cu)
                trials.append(skip_cu)
                cu = CuData(x, y, w, h, is_inter=True, merge=True,
                            geo=True, geo_split_dir=sd, geo_idx0=i0,
                            geo_idx1=i1)
                coder._apply_geo(ps, cu)
                add_resid_trial(cu)

        # AMVP trials: uni per list (+ bi combination for B slices)
        uni = {}
        for li in range(2 if is_b else 1):
            if coder.num_refs[li] == 0:
                continue
            probe = CuData(x, y, w, h, is_inter=True,
                           ref_idx=(0, -1) if li == 0 else (-1, 0))
            amvp = get_amvp_candidates(ps, coder.mf, coder.hmvp, x, y, w, h,
                                       li, 0, coder.ref_pocs, coder.tmvp)
            mv, mvp_idx = self._motion_search(src_me, x, y, w, h, amvp,
                                              coder.ref_pics[li][0][0],
                                              max_bottom=self.ifp_bottom)
            mvd = ((mv[0] - amvp[mvp_idx][0]) >> 2,
                   (mv[1] - amvp[mvp_idx][1]) >> 2)
            uni[li] = (mv, mvp_idx, mvd)
            mv_pair = (mv, (0, 0)) if li == 0 else ((0, 0), mv)
            ref_idx = (0, -1) if li == 0 else (-1, 0)
            py, pcb, pcr = mc_pred(mv_pair, ref_idx)
            if lmcs_map:
                py = coder.reshape.fwd_lut[py]
            cu = CuData(x, y, w, h, is_inter=True, merge=False,
                        mv=mv_pair, ref_idx=ref_idx)
            if w > 64 or h > 64:
                self._quant_resid_mtb(cu, src_y, src_cb, src_cr, py, pcb,
                                      pcr)
            else:
                if w > 64 or h > 64:
                    self._quant_resid_mtb(cu, src_y, src_cb, src_cr,
                                          py, pcb, pcr)
                else:
                    coeffs = self._quant_resid(src_y, src_cb, src_cr,
                                               py, pcb, pcr,
                                               cscale=cscale)
                    cu.root_cbf = any(c is not None for c in coeffs)
                    cu.coeff_y, cu.coeff_cb, cu.coeff_cr = coeffs
            if li == 0:
                cu.mvd, cu.mvp_idx = mvd, mvp_idx
            else:
                cu.mvd_l1, cu.mvp_idx_l1 = mvd, mvp_idx
            trials.append(cu)
        # 4x8/8x4 cannot be bi-predicted (vvenc CU::isBipredRestriction,
        # UnitTools.cpp:2220): the writer codes no bi bin there, so a
        # winning bi trial would desync the decoder.
        if is_b and 0 in uni and 1 in uni and w + h > 12:
            mv_pair = (uni[0][0], uni[1][0])
            ref_idx = (0, 0)
            # BCW weight loop (vvenc xEstimateInterResidual bcw loop):
            # default weight always; side weights when signalable
            bcw_list = [2]
            if coder.bcw_en and w * h >= 256:
                bcw_list += [1, 3] + ([0, 4] if coder.check_ldc else [])
            for bcw_i in bcw_list:
                cu = CuData(x, y, w, h, is_inter=True, merge=False,
                            mv=mv_pair, ref_idx=ref_idx,
                            mvd=uni[0][2], mvp_idx=uni[0][1],
                            mvd_l1=uni[1][2], mvp_idx_l1=uni[1][1],
                            bcw_idx=bcw_i)
                # BDOF applies to AMVP bi-pred: predict via the real path
                py = coder.pred_cu_inter(ps, cu, 0, mapped=True)
                pcb = coder.pred_cu_inter(ps, cu, 1)
                pcr = coder.pred_cu_inter(ps, cu, 2)
                if w > 64 or h > 64:
                    self._quant_resid_mtb(cu, src_y, src_cb, src_cr,
                                          py, pcb, pcr)
                else:
                    coeffs = self._quant_resid(src_y, src_cb, src_cr,
                                               py, pcb, pcr,
                                               cscale=cscale)
                    cu.root_cbf = any(c is not None for c in coeffs)
                    cu.coeff_y, cu.coeff_cb, cu.coeff_cr = coeffs
                trials.append(cu)

        # SMVD trial: one coded MVD, mirrored on the symmetric ref pair
        # (bi-pred, so it is also barred on 4x8/8x4)
        if is_b and coder.bi_dir_pred and w + h > 12:
            sym0, sym1 = coder.sym_ref
            probe = CuData(x, y, w, h, is_inter=True, smvd=True,
                           ref_idx=(sym0, sym1))
            amvp0 = coder.derive_amvp(ps, probe, 0)
            amvp1 = coder.derive_amvp(ps, probe, 1)
            mv0, mvp0 = self._motion_search(
                src_me, x, y, w, h, amvp0, coder.ref_pics[0][sym0][0],
                max_bottom=self.ifp_bottom)
            mvd = ((mv0[0] - amvp0[mvp0][0]) >> 2,
                   (mv0[1] - amvp0[mvp0][1]) >> 2)
            if mvd != (0, 0):
                mv1 = (amvp1[0][0] - (mvd[0] << 2),
                       amvp1[0][1] - (mvd[1] << 2))
                cu = CuData(x, y, w, h, is_inter=True, merge=False,
                            smvd=True, ref_idx=(sym0, sym1),
                            mv=(mv0, mv1), mvd=mvd, mvp_idx=mvp0,
                            mvd_l1=(-mvd[0], -mvd[1]), mvp_idx_l1=0)
                if not mv_access_ok(cu, self.ifp_bottom, y, h):
                    cu = None
            else:
                cu = None
            if cu is not None:
                py = coder.pred_cu_inter(ps, cu, 0, mapped=True)
                pcb = coder.pred_cu_inter(ps, cu, 1)
                pcr = coder.pred_cu_inter(ps, cu, 2)
                if w > 64 or h > 64:
                    self._quant_resid_mtb(cu, src_y, src_cb, src_cr,
                                          py, pcb, pcr)
                else:
                    coeffs = self._quant_resid(src_y, src_cb, src_cr,
                                               py, pcb, pcr,
                                               cscale=cscale)
                    cu.root_cbf = any(c is not None for c in coeffs)
                    cu.coeff_y, cu.coeff_cb, cu.coeff_cr = coeffs
                trials.append(cu)

        # AMVR trial: integer-pel MVD on the uni-L0 winner
        if coder.amvr and 0 in uni:
            probe = CuData(x, y, w, h, is_inter=True,
                           ref_idx=(0, -1), imv=1)
            amvp_i = coder.derive_amvp(ps, probe, 0)
            mv_q = uni[0][0]
            mv_int = (((mv_q[0] + 8) >> 4) << 4, ((mv_q[1] + 8) >> 4) << 4)
            mvd_i = ((mv_int[0] - amvp_i[0][0]) >> 4,
                     (mv_int[1] - amvp_i[0][1]) >> 4)
            if mvd_i != (0, 0):
                mv0 = (amvp_i[0][0] + (mvd_i[0] << 4),
                       amvp_i[0][1] + (mvd_i[1] << 4))
                cu = CuData(x, y, w, h, is_inter=True, merge=False,
                            mv=(mv0, (0, 0)), ref_idx=(0, -1),
                            mvd=mvd_i, mvp_idx=0, imv=1)
            else:
                cu = None
            if cu is not None and mv_access_ok(cu, self.ifp_bottom, y, h):
                py, pcb, pcr = mc_pred((mv0, (0, 0)), (0, -1))
                if lmcs_map:
                    py = coder.reshape.fwd_lut[py]
                if w > 64 or h > 64:
                    self._quant_resid_mtb(cu, src_y, src_cb, src_cr,
                                          py, pcb, pcr)
                else:
                    coeffs = self._quant_resid(src_y, src_cb, src_cr,
                                               py, pcb, pcr,
                                               cscale=cscale)
                    cu.root_cbf = any(c is not None for c in coeffs)
                    cu.coeff_y, cu.coeff_cb, cu.coeff_cr = coeffs
                trials.append(cu)

        # affine AMVP trials: gradient-based CPMV search per list
        # (InterSearch::xAffineMotionEstimation analog, uni prediction).
        # Skipped under an IFP window (the gradient iteration's reads are
        # unbounded); the restriction is a static function of the CTU row,
        # so the bitstream stays worker-count independent.
        if coder.affine_en and w >= 16 and h >= 16 \
                and self.ifp_bottom is None:
            from ..codec.affine import (affine_amvp_list,
                                        derive_affine_grids,
                                        affine_predict_list)
            from ..ops.affine_search import affine_search
            for aff_type in ((0, 1) if coder.affine_type_en else (0,)):
                n_cp = 3 if aff_type else 2
                for li in range(2 if is_b else 1):
                    if coder.num_refs[li] == 0:
                        continue
                    ref_idx = (0, -1) if li == 0 else (-1, 0)
                    probe = CuData(x, y, w, h, is_inter=True, affine=True,
                                   affine_type=aff_type, merge=False,
                                   ref_idx=ref_idx)
                    mvps = affine_amvp_list(coder, ps, probe, li, 0)
                    pred_cps = mvps[0]

                    def pred_fn(cp, probe=probe, li=li):
                        cpmv = [((0, 0),) * 3, ((0, 0),) * 3]
                        cpmv[li] = tuple(cp)
                        probe.cpmv = tuple(cpmv)
                        derive_affine_grids(coder, probe)
                        return affine_predict_list(coder, probe, li, 0,
                                                   False)
                    cp, _ = affine_search(src_me, pred_fn,
                                          [tuple(m) for m in pred_cps],
                                          aff_type == 1, w, h)
                    d0 = ((cp[0][0] - pred_cps[0][0]) >> 2,
                          (cp[0][1] - pred_cps[0][1]) >> 2)
                    mvds = [d0]
                    for i in range(1, n_cp):
                        mvds.append(
                            (((cp[i][0] - pred_cps[i][0]) >> 2) - d0[0],
                             ((cp[i][1] - pred_cps[i][1]) >> 2) - d0[1]))
                    if all(d == (0, 0) for d in mvds):
                        continue
                    amvds = [[(0, 0)] * 3, [(0, 0)] * 3]
                    amvds[li] = mvds + [(0, 0)] * (3 - n_cp)
                    cu = CuData(x, y, w, h, is_inter=True, merge=False,
                                affine=True, affine_type=aff_type,
                                ref_idx=ref_idx,
                                aff_mvds=(amvds[0], amvds[1]))
                    if li == 0:
                        cu.mvp_idx = 0
                    else:
                        cu.mvp_idx_l1 = 0
                    # derive CPMVs/grids exactly as the decoder will
                    coder._derive_affine_amvp_mvs(ps, cu)
                    py = coder.pred_cu_inter(ps, cu, 0, mapped=True)
                    pcb = coder.pred_cu_inter(ps, cu, 1)
                    pcr = coder.pred_cu_inter(ps, cu, 2)
                    if w > 64 or h > 64:
                        self._quant_resid_mtb(cu, src_y, src_cb, src_cr,
                                              py, pcb, pcr)
                    else:
                        coeffs = self._quant_resid(src_y, src_cb, src_cr,
                                                   py, pcb, pcr,
                                                   cscale=cscale)
                        cu.root_cbf = any(c is not None for c in coeffs)
                        cu.coeff_y, cu.coeff_cb, cu.coeff_cr = coeffs
                    if cu.root_cbf:
                        trials.append(cu)


        import os as _os
        if _os.environ.get("VTE_DBG_TRIALS"):
            import sys as _sys
            ks = []
            for t in trials:
                ks.append("%s%s%s%s%s%s%s mv%s r%s" % (
                    "S" if t.skip else "", "M" if t.merge else "",
                    "V" if t.mmvd_flag else "", "G" if t.geo else "",
                    "A" if t.affine else "", "D" if t.smvd else "",
                    "I" if t.imv else "", t.mv, t.ref_idx))
            print(f"PYTRIALS ({x},{y} {w}x{h}) n={len(trials)} " +
                  " | ".join(ks), file=_sys.stderr)
        return self._finish_inter_trials(
            x, y, w, h, part, trials, src_y, src_cb, src_cr, cscale, qy,
            cx, cy2, cw, chh)

    def _finish_inter_trials(self, x, y, w, h, part, trials, src_y,
                             src_cb, src_cr, cscale, qy, cx, cy2, cw, chh):
        """Tail of the inter CU decision: trial evaluation through the
        real syntax writer + the gated intra competition (shared by the
        full path and the FIM merge-perfect early out)."""
        import numpy as _np
        coder = self.coder
        ps = self.ps
        bit_depth = self.cfg.bit_depth
        # intra fallback: best-SATD mode, full residual.  Intra CUs are
        # capped at 64 (no larger intra pred/TB): >maxTB CUs rely on the
        # always-present merge/AMVP trials instead.
        if w > 64 or h > 64:
            state0 = self._save(x, y, max(w, h))
            best = None
            node = TreeNode(x, y, max(w, h), part.qt_depth, w=w, h=h,
                            part=part)
            for cu in trials:
                self._restore(state0)
                b0 = self.est.frac_bits
                node.cu = cu
                try:
                    coder._enc_cu(self.est, ps, node)
                except AssertionError:
                    continue
                bits = (self.est.frac_bits - b0) / (1 << 15)
                dist = R.sse_np(src_y, ps.rec[0][y:y + h, x:x + w])
                dist += self.cw[1] * R.sse_np(
                    src_cb, ps.rec[1][cy2:cy2 + chh, cx:cx + cw])
                dist += self.cw[2] * R.sse_np(
                    src_cr, ps.rec[2][cy2:cy2 + chh, cx:cx + cw])
                cost = dist + self.lmbda * bits
                if best is None or cost < best[0]:
                    best = (cost, cu, self._save(x, y, max(w, h)))
            self._restore(best[2])
            return best[1], best[0]
        # evaluate trials through the real syntax writer + estimator
        state0 = self._save(x, y, max(w, h))
        node = TreeNode(x, y, max(w, h), part.qt_depth, w=w, h=h, part=part)

        def _eval(cands, best):
            for cu in cands:
                _ss_bump("inter_skip" if cu.skip else
                         "inter_geo" if cu.geo else
                         "inter_mmvd" if cu.mmvd_flag else
                         "inter_affine" if cu.affine else
                         "inter_ciip" if cu.ciip else
                         "inter_merge" if cu.merge else
                         "inter_sbt" if cu.sbt_idx else
                         "inter_smvd" if cu.smvd else
                         "inter_amvp" if cu.is_inter else
                         "intra_in_inter")
                self._restore(state0)
                b0 = self.est.frac_bits
                node.cu = cu
                try:
                    coder._enc_cu(self.est, ps, node)
                except AssertionError:
                    continue  # malformed trial (merge with no luma coeffs)
                bits = (self.est.frac_bits - b0) / (1 << 15)
                dist = R.sse_np(src_y, ps.rec[0][y:y + h, x:x + w])
                dist += self.cw[1] * R.sse_np(
                    src_cb, ps.rec[1][cy2:cy2 + chh, cx:cx + cw])
                dist += self.cw[2] * R.sse_np(
                    src_cr, ps.rec[2][cy2:cy2 + chh, cx:cx + cw])
                cost = dist + self.lmbda * bits
                if best is None or cost < best[0]:
                    best = (cost, cu, self._save(x, y, max(w, h)))
            return best

        tfilt = self.enc.trial_filter
        if tfilt is None:
            best = _eval(trials, None)
            # intra competition in inter slices (EncCu xCheckRDCostIntra
            # in inter pictures) gated per the reference's mode control
            # (EncModeCtrl.cpp:997: "avoid very complex intra if it is
            # unlikely"): intra is tried only when the best inter
            # candidate CODES residual in some component — a zero-cbf
            # inter winner means prediction already fits at this QP and
            # intra cannot plausibly win.
            best_cu = best[1] if best is not None else None
            try_intra = (best_cu is None
                         or best_cu.coeff_y is not None
                         or best_cu.coeff_cb is not None
                         or best_cu.coeff_cr is not None)
        else:
            # test hook active: trial selection must see the COMBINED
            # candidate set, so the gate is bypassed
            best = None
            try_intra = True
        # vvenc-style restriction of the intra competition in inter
        # pictures (EncModeCtrl.cpp:997 "avoid very complex intra"):
        # large CUs practically never win intra in inter pictures — the
        # merge/AMVP trials cover them
        if try_intra and w * h > 2048:
            try_intra = False
        if try_intra:
            intra_trials = []
            top, left = I.build_reference_samples(
                ps.rec[0], x, y, w, h, ps.avail_luma(),
                PictureState.LUMA_UNIT, bit_depth)
            from .. import native as _native

            def _satd(modes):
                if _native.available():
                    return _native.presel_satd(top, left, src_y, modes,
                                               w, h, bit_depth)
                preds_all = IV.predict_intra_modes(
                    top, left, modes, w, h, bit_depth)
                return IV.satd_modes(src_y, preds_all)
            mpm_i = get_intra_mpms(ps, x, y, w, h, self.cfg.ctu_size)

            def _key(m, s):
                return float(s) + self.lmbda_sad * (
                    (1.5 + mpm_i.index(m)) if m in mpm_i else 7.0)
            # subset sweep: planar/DC + even angular, then the odd
            # neighbors of the 3 strongest (the intra searcher's own
            # coarse-to-fine pattern)
            modes0 = [0, 1] + list(range(2, I.NUM_LUMA_MODE, 2))
            satds0 = _satd(modes0)
            keyed = {m: _key(m, s) for m, s in zip(modes0, satds0)}
            ranked0 = sorted(modes0, key=lambda m: keyed[m])
            odds = []
            for m in ranked0[:3]:
                for n in (m - 1, m + 1):
                    if 2 <= n < I.NUM_LUMA_MODE and n not in keyed \
                            and n not in odds:
                        odds.append(n)
            if odds:
                satds1 = _satd(odds)
                for m, s in zip(odds, satds1):
                    keyed[m] = _key(m, s)
            ranked = sorted(keyed, key=lambda m: keyed[m])
            n_try = max(1, min(2, self.cfg.num_full_rd_modes))
            modes_try = ranked[:n_try]
            if I.PLANAR_IDX not in modes_try:
                modes_try.append(I.PLANAR_IDX)
            th0, tv0 = T.implicit_mts_types(w, h, True,
                                            self.coder.implicit_mts)
            for mode in modes_try:
                pred = I.predict_intra(top, left, mode, w, h, bit_depth,
                                       True)
                cu = CuData(x, y, w, h, is_inter=False, luma_mode=mode)
                cu.coeff_y = self._tq(src_y - pred, qy, True,
                                      ct.CTX_SETS["QtCbfLuma"](0), th0,
                                      tv0, intra_slice=False)
                pred_cb = predict_cu_component(ps, cu, 1, bit_depth)
                pred_cr = predict_cu_component(ps, cu, 2, bit_depth)
                rcb, rcr = src_cb - pred_cb, src_cr - pred_cr
                if cscale is not None:
                    from ..codec.lmcs import scale_chroma_resi_fwd
                    rcb = scale_chroma_resi_fwd(rcb.astype(_np.int64),
                                                cscale, bit_depth)
                    rcr = scale_chroma_resi_fwd(rcr.astype(_np.int64),
                                                cscale, bit_depth)
                ccb = self._tq(rcb, self.qp.chroma_qp(1), False,
                               ct.CTX_SETS["QtCbfCb"](0),
                               intra_slice=False,
                               lmbda=self.lmbda / self.cw[1])
                ccr = self._tq(rcr, self.qp.chroma_qp(2), False,
                               ct.CTX_SETS["QtCbfCr"](1 if ccb is not None
                                                      else 0),
                               intra_slice=False,
                               lmbda=self.lmbda / self.cw[2])
                cu.coeff_cb = ccb
                cu.coeff_cr = ccr
                intra_trials.append(cu)
            if tfilt is not None:
                allt = trials + intra_trials
                kept = [t for t in allt if tfilt(t)]
                best = _eval(kept if kept else allt, None)
            else:
                best = _eval(intra_trials, best)
        self._restore(best[2])
        return best[1], best[0]

    def _add_sbt_trials(self, base_cu, allowed, resi_y, resi_cb, resi_cr,
                        trials):
        """Sub-block-transform variants: the residual lives in one half of
        the CU (DST7/DCT8 per position when MTS is on), the rest is zeroed
        (vvenc InterSearch xEstimateInterResidual SBT loop)."""
        import copy
        from ..codec.ctu_syntax import sbt_tu_rect
        qy = self.qp.luma_qp()
        for sbt_idx in (1, 2):                 # VER_HALF / HOR_HALF
            if not (allowed >> sbt_idx) & 1:
                continue
            for pos_ in (0, 1):
                cu = copy.copy(base_cu)
                cu.sbt_idx, cu.sbt_pos = sbt_idx, pos_
                tx, ty, tw, th, trh, trv = sbt_tu_rect(cu)
                if not self.enc.sps.mts:
                    trh = trv = T.DCT2
                coeff_y = self._tq(resi_y[ty:ty + th, tx:tx + tw], qy,
                                   True, ct.CTX_SETS["QtCbfLuma"](0),
                                   trh, trv, intra_slice=False)
                if coeff_y is None:
                    continue
                cu.coeff_y = coeff_y
                # LMCS chroma scale at the SBT TU's luma position
                cscale = self._chroma_scale(base_cu.x + tx, base_cu.y + ty,
                                            tw >> 1, th >> 1)
                for comp, resi_c in ((1, resi_cb), (2, resi_cr)):
                    sub = resi_c[ty >> 1:(ty + th) >> 1,
                                 tx >> 1:(tx + tw) >> 1]
                    if cscale is not None:
                        from ..codec.lmcs import scale_chroma_resi_fwd
                        sub = scale_chroma_resi_fwd(
                            sub.astype(np.int64), cscale,
                            self.cfg.bit_depth)
                    cc = self._tq(sub, self.qp.chroma_qp(comp), False,
                                  None, intra_slice=False,
                                  lmbda=self.lmbda / self.cw[comp])
                    if comp == 1:
                        cu.coeff_cb = cc
                    else:
                        cu.coeff_cr = cc
                cu.root_cbf = True
                trials.append(cu)

    def _quant_resid_mtb(self, cu, src_y, src_cb, src_cr, py, pcb, pcr):
        """Residual of a >maxTB inter CU: implicit 64x64 TU tiling
        (TU_MAX_TR_SPLIT searcher side — the counterpart of the coder's
        _code_max_tb_tus / reconstruct_cu mtb branch).  Fills cu.mtb_tus
        with (tx, ty, tw, th, cy, ccb, ccr, joint, ts_cb, ts_cr) tuples
        and cu.root_cbf; mtb_tus stays None when every TU is empty
        (matching the decoder's root_cbf == 0 state)."""
        import numpy as _np
        bd = self.cfg.bit_depth
        qy = self.qp.luma_qp()
        sw, sh_ = min(cu.w, 64), min(cu.h, 64)
        tus = []
        any_c = False
        for ty in range(0, cu.h, sh_):
            for tx in range(0, cu.w, sw):
                ry = src_y[ty:ty + sh_, tx:tx + sw] \
                    - py[ty:ty + sh_, tx:tx + sw]
                cy_ = self._tq(ry, qy, True, None, intra_slice=False)
                cx2, cy2 = tx >> 1, ty >> 1
                cw2, ch2 = sw >> 1, sh_ >> 1
                # per-TU LMCS chroma scale (decoder dequantizes each TU
                # with the scale at ITS position)
                csc = self._chroma_scale(cu.x + tx, cu.y + ty, cw2, ch2)
                cc = []
                for comp, (srcc, predc) in ((1, (src_cb, pcb)),
                                            (2, (src_cr, pcr))):
                    rc = srcc[cy2:cy2 + ch2, cx2:cx2 + cw2] \
                        - predc[cy2:cy2 + ch2, cx2:cx2 + cw2]
                    if csc is not None:
                        from ..codec.lmcs import scale_chroma_resi_fwd
                        rc = scale_chroma_resi_fwd(
                            rc.astype(_np.int64), csc, bd)
                    cc.append(self._tq(
                        rc, self.qp.chroma_qp(comp), False, None,
                        intra_slice=False,
                        lmbda=self.lmbda / self.cw[comp]))
                if cy_ is not None or cc[0] is not None \
                        or cc[1] is not None:
                    any_c = True
                tus.append((tx, ty, sw, sh_, cy_, cc[0], cc[1], 0,
                            False, False))
        cu.mtb_tus = tus if any_c else None
        cu.root_cbf = any_c
        return any_c

    def _quant_resid(self, src_y, src_cb, src_cr, py, pcb, pcr,
                     cscale=None):
        import numpy as _np
        bit_depth = self.cfg.bit_depth
        out = []
        cbfs = (ct.CTX_SETS["QtRootCbf"](0), ct.CTX_SETS["QtCbfCb"](0), None)
        for i, (src, pred, q) in enumerate(
                ((src_y, py, self.qp.luma_qp()),
                 (src_cb, pcb, self.qp.chroma_qp(1)),
                 (src_cr, pcr, self.qp.chroma_qp(2)))):
            cbf_ctx = cbfs[i] if i < 2 else \
                ct.CTX_SETS["QtCbfCr"](1 if out[1] is not None else 0)
            resi = src - pred
            if i and cscale is not None:
                from ..codec.lmcs import scale_chroma_resi_fwd
                resi = scale_chroma_resi_fwd(resi.astype(_np.int64),
                                             cscale, bit_depth)
            out.append(self._tq(resi, q, i == 0, cbf_ctx,
                                intra_slice=False,
                                lmbda=self.lmbda / self.cw[i]))
        return out

    def _valid_pos(self, sx, sy, w, h, pw, ph, max_bottom):
        from .ifp import MC_MARGIN
        if sx < -w or sy < -h or sx > pw or sy > ph:
            return False
        if max_bottom is not None and sy + h + MC_MARGIN > max_bottom:
            return False
        return True

    def _sse_grid(self, src_y, ref_y, cx0, cy0, w, h, rx, ry):
        """SSE of src at every integer displacement in the window
        [cx0-rx, cx0+rx] x [cy0-ry, cy0+ry], vectorized (sliding windows).
        Returns costs [2ry+1, 2rx+1] int64 (edge-clamped ref reads)."""
        import numpy as _np
        ph, pw = ref_y.shape
        xs = _np.clip(_np.arange(cx0 - rx, cx0 + rx + w), 0, pw - 1)
        ys = _np.clip(_np.arange(cy0 - ry, cy0 + ry + h), 0, ph - 1)
        win = ref_y[_np.ix_(ys, xs)].astype(_np.int64)
        sw = _np.lib.stride_tricks.sliding_window_view(win, (h, w))
        # SSE = sum(src^2) + box(win^2) - 2*corr; corr via tensordot over
        # the window dims (exact integer arithmetic)
        s = src_y.astype(_np.int64)
        corr = _np.tensordot(sw, s, axes=([2, 3], [0, 1]))
        # integral-image box sums of win^2
        ii = _np.pad(win * win, ((1, 0), (1, 0))).cumsum(0).cumsum(1)
        b2 = (ii[h:, w:] - ii[:-h, w:] - ii[h:, :-w] + ii[:-h, :-w])
        return (s * s).sum() + b2 - 2 * corr

    def _use_device_me(self) -> bool:
        mode = self.cfg.me_mode
        if mode == "auto":
            # measured through the axon tunnel: the per-(picture,
            # reference) program dispatch+load costs seconds per pair at
            # EVERY frame size (erratic 0.2-120 s load latency), always
            # dominating the host coarse stage's milliseconds.  Auto
            # resolves to host; me_mode=device stays available for real
            # multi-chip deployments where programs load once.
            mode = "host"
            self.cfg.me_mode = mode
        return mode == "device"

    def _device_me(self, ref_y):
        """Per-(picture, reference) device pre-ME table (lazy)."""
        cache = getattr(self, "_dev_me_cache", None)
        if cache is None:
            cache = self._dev_me_cache = {}
        key = id(ref_y)
        tab = cache.get(key)
        if tab is None and key not in cache:
            from ..ops.me import FrameMe
            try:
                tab = FrameMe(self.src_me_y, ref_y,
                              R=min(64, self.cfg.search_range))
            except Exception:                      # noqa: BLE001
                tab = None                         # fall back to host
            cache[key] = tab
        return tab

    def _motion_search(self, src_y, x, y, w, h, amvp, ref_y,
                       max_bottom=None):
        """Hierarchical integer ME (TZ-search coverage analog,
        vvenc InterSearch::xTZSearch semantics: predictor-centered,
        SearchRange-wide) + half/quarter refinement; chooses the mvp
        index minimizing mvd bits.

        Integer stage: dense SSE grid at 1/4 resolution over the full
        search range around each start candidate (both AMVP predictors +
        zero MV), then a dense full-resolution +-4 refine around the
        best coarse position and around each start candidate.

        max_bottom: IFP window — candidates whose motion-compensated
        read would touch that picture row or below are excluded (the
        half/quarter refinement moves the MV by < 1 integer pel, which
        the ifp.MC_MARGIN already covers)."""
        import numpy as _np
        from .ifp import MC_MARGIN
        R_ = self.cfg.search_range
        ph, pw = ref_y.shape

        def clamp_center(px, py):
            cx = min(max(px, -w), pw)
            cy = min(max(py, -h), ph)
            if max_bottom is not None:
                cy = min(cy, max_bottom - h - MC_MARGIN)
            return cx, cy

        centers = []
        for p in (amvp[0], amvp[1], (0, 0)):
            c = clamp_center(x + (p[0] >> 4), y + (p[1] >> 4))
            if c not in centers:
                centers.append(c)

        fine = []                      # full-res refine centers
        # under an IFP window both coarse stages are skipped: the ds4
        # plane cache would snapshot reference rows that are still being
        # produced (worker-timing dependent), so only the bounded
        # predictor-centered fine search runs
        if max_bottom is not None:
            pass
        elif R_ > 8 and w >= 8 and h >= 8 and self._use_device_me():
            # device pre-ME: the frame-level batched full search already
            # ran on the TPU for this (picture, reference) — its winner
            # for the block containing this CU replaces the numpy coarse
            # stage as the refine center (ops/me.py frame_me)
            tab = self._device_me(ref_y)
            if tab is not None:
                dmx, dmy = tab.lookup(x + w // 2, y + h // 2)
                fine.append(clamp_center(x + dmx, y + dmy))
        elif R_ > 8 and w >= 8 and h >= 8 and (w % 4 == 0 and h % 4 == 0):
            # coarse stage at 1/4 resolution over the whole range
            ds_key = ("me_ds4", id(ref_y))
            cache = getattr(self, "_me_cache", None)
            if cache is None:
                cache = self._me_cache = {}
            ref_ds = cache.get(ds_key)
            if ref_ds is None:
                hh, ww = (ph // 4) * 4, (pw // 4) * 4
                ref_ds = ref_y[:hh, :ww].reshape(hh // 4, 4, ww // 4, 4) \
                    .astype(_np.int64).mean(axis=(1, 3)).astype(_np.int32)
                cache[ds_key] = ref_ds
            sh, sw_ = h // 4, w // 4
            src_ds = src_y[:sh * 4, :sw_ * 4] \
                .reshape(sh, 4, sw_, 4).astype(_np.int64) \
                .mean(axis=(1, 3)).astype(_np.int32)
            rq = max(1, R_ // 4)
            for (cx0, cy0) in centers:
                costs = self._sse_grid(src_ds, ref_ds, cx0 // 4, cy0 // 4,
                                       sw_, sh, rq, rq)
                dy_, dx_ = _np.unravel_index(int(costs.argmin()),
                                             costs.shape)
                fx = (cx0 // 4 - rq + int(dx_)) * 4
                fy = (cy0 // 4 - rq + int(dy_)) * 4
                fine.append(clamp_center(fx, fy))
        fine += centers

        best = None
        rr = 4 if R_ > 8 else R_
        seen = set()
        for (cx0, cy0) in fine:
            if (cx0, cy0) in seen:
                continue
            seen.add((cx0, cy0))
            costs = self._sse_grid(src_y, ref_y, cx0, cy0, w, h, rr, rr)
            for dy in range(-rr, rr + 1):
                for dx in range(-rr, rr + 1):
                    sx, sy = cx0 + dx, cy0 + dy
                    if not self._valid_pos(sx, sy, w, h, pw, ph,
                                           max_bottom):
                        continue
                    c = int(costs[dy + rr, dx + rr])
                    if best is None or c < best[0]:
                        best = (c, ((sx - x) << 4, (sy - y) << 4))
        if best is None:
            best = (0.0, ((centers[0][0] - x) << 4,
                          (centers[0][1] - y) << 4))
        mv = best[1]
        # half then quarter refinement (steps of 8 and 4 in 1/16 units)
        for step in (8, 4):
            improved = True
            cand_best = (self._mc_cost(src_y, x, y, w, h, mv, ref_y,
                                       amvp[0]), mv)
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    if dx == 0 and dy == 0:
                        continue
                    m = (mv[0] + dx, mv[1] + dy)
                    c = self._mc_cost(src_y, x, y, w, h, m, ref_y, amvp[0])
                    if c < cand_best[0]:
                        cand_best = (c, m)
            mv = cand_best[1]
        # mvp selection by mvd magnitude
        def mvd_bits(mvp):
            return (abs(mv[0] - mvp[0]) + abs(mv[1] - mvp[1])) >> 2
        mvp_idx = 0 if mvd_bits(amvp[0]) <= mvd_bits(amvp[1]) else 1
        import os as _os
        if _os.environ.get("VTE_DBG_ME"):
            import sys as _sys
            print(f"PYME ({x},{y} {w}x{h}) amvp({amvp[0][0]},{amvp[0][1]})"
                  f"({amvp[1][0]},{amvp[1][1]}) int({best[1][0]},{best[1][1]})"
                  f" mv({mv[0]},{mv[1]}) bot {max_bottom}",
                  file=_sys.stderr)
        return mv, mvp_idx

    def _mc_cost(self, src_y, x, y, w, h, mv, ref_y, mvp):
        pred = mc_block_np(ref_y, x, y, w, h, mv[0], mv[1],
                           self.cfg.bit_depth, True)
        bits = ((abs(mv[0] - mvp[0]) + abs(mv[1] - mvp[1])) >> 2) * 1.5 + 2
        return R.sse_np(src_y, pred) + self.lmbda * bits


