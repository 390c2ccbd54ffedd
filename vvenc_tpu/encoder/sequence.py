"""Sequence/GOP orchestration of the encoder (EncGOP/EncLib analog):
display->coding order, GOP-frame scheduling, frame-parallel and IFP
pipelines, segment (GOP-pool) parallelism, and the device RD-plan
prefill pipeline.

Mixin of IntraEncoder (encoder/intra_encoder.py) — split out of the
encoder monolith; methods run with the encoder's state.  Reference
analogs: vvenc EncGOP.cpp processing lists (:1592-1680), EncLib.cpp GOP
parallelism (:284), and the stage pipeline they drive.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.params import SLICE_B, SLICE_I, SLICE_P
from ..codec.picture import PictureState
from ..utils.profiler import PROF
from .gop import build_gop


class SequenceOrchestratorMixin:
    """encode_sequence + GOP/segment/pipeline scheduling of IntraEncoder."""

    def encode_sequence(self, frames):
        """Encode a sequence with the configured GOP structure.

        frames: list of (Y, U, V).  Returns the Annex-B stream; per-POC
        reconstructions available in self.recs_by_poc."""
        cfg = self.cfg
        self.recs_by_poc = {}
        stream = bytearray()
        # PreProcess stage: visual activity + scene-cut (STA) + SCC
        # detection over the original frames (vvenc PreProcess analog)
        from .preprocess import PreProcess
        pp = PreProcess(frame_rate=(cfg.fps_num + cfg.fps_den - 1)
                        // cfg.fps_den)
        self.analysis = [pp.push(f[0]) for f in frames]
        self.scc_detected = pp.sequence_is_scc()
        if cfg.scc_auto and self.scc_detected and not cfg.transform_skip:
            # vvenc "auto" SCC tools (IBC=2/TS=2/BDPCM=2): enable on the
            # PreProcess screen-content decision
            cfg.transform_skip = True
            cfg.bdpcm = True
            cfg.ibc = True
            from .intra_encoder import build_parameter_sets
            self.sps, self.pps = build_parameter_sets(cfg)
            self._headers = None
        if cfg.intra_period != 1 and cfg.gop_size <= 1:
            # adaptive intra placement: IDR at detected scene cuts
            self._force_idr_pocs = {a.poc for a in self.analysis
                                    if a.is_scene_cut}
        self._fgc_sei = None
        if cfg.film_grain:
            from .filmgrain import derive_fgc_sei, SEI_FILM_GRAIN
            from ..bitstream.sei import write_sei_nal
            sei = derive_fgc_sei([f[0] for f in frames],
                                 cfg.input_bit_depth)
            if sei is not None:
                self._fgc_sei = write_sei_nal(
                    [(SEI_FILM_GRAIN, sei.payload())], prefix=True)
        if cfg.mctf and len(frames) > 2 and cfg.gop_size > 1:
            from .mctf import apply_mctf
            with PROF.section("stage.mctf"):
                # frames[0] is global index (start_offset - lead_frames):
                # phase the filter periods on GLOBAL indices so a --skip
                # not aligned to every period still matches the one-shot
                # encode's filtering decisions
                phase = cfg.start_offset - cfg.lead_frames
                if cfg.bim:
                    frames, self._bim_map = apply_mctf(
                        frames, cfg.gop_size, cfg.qp, cfg.input_bit_depth,
                        bim_ctu_size=cfg.ctu_size,
                        min_noise=self.min_noise,
                        poc_offset=phase)
                else:
                    frames = apply_mctf(frames, cfg.gop_size, cfg.qp,
                                        cfg.input_bit_depth,
                                        poc_offset=phase)
        if cfg.lead_frames or cfg.trail_frames:
            # segment mode (vvencCfg.h:460/758-759): the lead/trail
            # frames existed only as MCTF context across the segment
            # joins; drop them before coding so the coded pictures match
            # the one-shot encode of the same range byte for byte
            lead, trail = cfg.lead_frames, cfg.trail_frames
            frames = frames[lead:len(frames) - trail if trail else None]
            self.analysis = self.analysis[
                lead:len(self.analysis) - trail if trail else None]
            self._bim_map = {p - lead: m for p, m in self._bim_map.items()
                            if lead <= p < lead + len(frames)}
        # RC lookahead (vvenc m_LookAhead): complexity pre-analysis feeds
        # the single-pass controller's per-picture allocation
        la_on = (cfg.lookahead and self.rc is not None and cfg.bitrate > 0
                 and self.rc.stats is None)
        if cfg.gop_size <= 1 or cfg.intra_period == 1:
            if (cfg.max_parallel_frames > 1 and cfg.intra_period == 1
                    and cfg.bitrate == 0 and not cfg.rc_stats_out
                    and len(frames) > 1):
                return self._encode_all_intra_parallel(frames)
            if la_on and cfg.intra_period == 1:
                from .lookahead import analyze_intra
                self.rc.set_lookahead(analyze_intra(frames))
            if cfg.intra_period == 1 and self._plan_prefill_ok():
                self._prefill_plans_async(frames, list(range(len(frames))))
            for f in frames:
                stream += self.encode_frame(f)
                self.recs_by_poc[self.frames_done - 1] = dict(self.last_rec.rec)
            if self.rc is not None and self.cfg.rc_stats_out \
                    and self.cfg.rc_stats_out != "collect:":
                self.rc.write_stats(self.cfg.rc_stats_out)
            return bytes(stream)
        # random-access hierarchical GOPs
        if cfg.intra_period > 1 and len(frames) > cfg.intra_period:
            # segment the sequence at the intra period: every segment
            # starts with an IDR and is fully independent (vvenc
            # numParallelGOPs analog; bitstream is identical for any
            # worker count — the reference's determinism contract)
            return self._encode_gop_segments(frames)
        gop = cfg.gop_size
        # IFP (CTU-line-synchronized inter-frame parallelism): the motion
        # restriction is part of the bitstream contract, so the mode must
        # not depend on the worker count
        # QPA works under IFP: the per-CTU lambdas/QPs derive from
        # display-order originals pre-populated before the threads start,
        # and the CTU loop keeps lambda picture-local
        ifp_mode = (cfg.ifp and cfg.bitrate == 0 and not cfg.rc_stats_out
                    and not cfg.lmcs and not cfg.wpp
                    and cfg.tile_cols == 1 and cfg.tile_rows == 1)
        # QPA is wave-safe: its inputs (display-order originals, the
        # MCTF-settled min-noise stats, per-POC BIM offsets) are all
        # fixed before encoding starts, so workers receive them by POC.
        # Waves only pay off when a temporal layer actually holds >= 2
        # frames (GOP >= 4): each worker job builds a fresh encoder, so
        # single-frame waves are pure overhead.
        frame_parallel = (not ifp_mode and cfg.max_parallel_frames > 1
                          and cfg.bitrate == 0 and cfg.gop_size >= 4
                          and not cfg.rc_stats_out)
        # frame-parallel encodes use the TL-independent GOP structure
        entries = build_gop(gop, max_refs=cfg.num_refs,
                            parallel=frame_parallel)
        if la_on and len(frames) > gop:
            # run the first window's REAL first pass BEFORE the IDR so
            # the absolute-level prior covers the whole sequence start
            from .lookahead import first_pass_gop
            la_c, la_real = first_pass_gop(frames, 0, entries, cfg)
            tls = {e.poc_in_gop: e.temporal_layer for e in entries}
            tls[0] = 0
            self.rc.set_lookahead(
                la_c, pixels=(cfg.width * cfg.height if la_real
                              else None), tls=tls)
        stream += self._encode_picture(0, frames[0], SLICE_I, [], [])
        self.recs_by_poc[0] = dict(self.last_rec.rec)
        base = 0
        while base + gop < len(frames):
            self._protect_refs(entries, base, gop)
            if la_on:
                # real half-resolution FIRSTPASS encode of the GOP window
                # (vvenc LookAhead stage), SAD proxy for tiny pictures
                from .lookahead import first_pass_gop
                la_c, la_real = first_pass_gop(frames, base, entries, cfg)
                tls = {base + e.poc_in_gop: e.temporal_layer
                       for e in entries}
                self.rc.set_lookahead(
                    la_c, pixels=(cfg.width * cfg.height if la_real
                                  else None), tls=tls)
            if ifp_mode:
                stream += self._encode_gop_frames_ifp(frames, base,
                                                      entries)
            elif frame_parallel:
                stream += self._encode_gop_frames_parallel(
                    frames, base, entries)
            else:
                for e in entries:
                    poc = base + e.poc_in_gop
                    avail = {d[0] for d in self.dpb}

                    def _ok(p):
                        if p not in avail:
                            return False
                        # after a DRAP, trailing pictures may only reach
                        # the DRAP or the IRAP (H.274 DRAP semantics)
                        if poc > self._drap_floor:
                            return p >= self._drap_floor or p == 0
                        return True
                    is_drap = (cfg.drap_period > 0
                               and e.poc_in_gop == cfg.gop_size
                               and poc % cfg.drap_period == 0)
                    if is_drap:
                        assert 0 in avail, \
                            "DRAP: associated IRAP evicted from DPB"
                        refs_l0, refs_l1 = [0], []
                    else:
                        refs_l0 = [base + r for r in e.refs_past
                                   if _ok(base + r)] or [base]
                        refs_l1 = [base + r for r in e.refs_future
                                   if _ok(base + r)]
                    st = SLICE_B if refs_l1 else SLICE_P
                    qp_off = e.final_qp_offset(cfg.qp)
                    au = self._encode_picture(poc, frames[poc], st, refs_l0,
                                              refs_l1, qp_off,
                                              tlayer=e.temporal_layer)
                    if is_drap:
                        from ..bitstream.sei import (write_sei_nal,
                                                     SeiDrapIndication,
                                                     SEI_DEPENDENT_RAP)
                        au = write_sei_nal(
                            [(SEI_DEPENDENT_RAP,
                              SeiDrapIndication().payload())],
                            prefix=True) + au
                        self._drap_floor = poc
                    stream += au
                    self.recs_by_poc[poc] = dict(self.last_rec.rec)
            base += gop
        # tail: IPPP on remaining frames
        tail_pocs = [p for p in range(base + 1, len(frames))
                     if p not in self.recs_by_poc]
        if la_on and tail_pocs:
            # real first-pass stats for the tail too — without them the
            # controller falls back to the EWMA loop whose feedforward
            # the tiny high-TL pictures have biased low (overshoot on
            # the tail anchors)
            from dataclasses import dataclass as _dc
            from .lookahead import first_pass_gop

            @_dc
            class _TailEntry:
                poc_in_gop: int
                refs_past: tuple = (0,)     # IPPP: previous frame
                refs_future: tuple = ()
            la_c, la_real = first_pass_gop(
                frames, base, [_TailEntry(p - base) for p in tail_pocs],
                cfg)
            la_c = {p: v for p, v in la_c.items() if p in set(tail_pocs)}
            self.rc.set_lookahead(
                la_c, pixels=(cfg.width * cfg.height if la_real
                              else None), tls={p: 0 for p in tail_pocs})
        for poc in range(base + 1, len(frames)):
            if poc in self.recs_by_poc:
                continue
            au = self._encode_picture(poc, frames[poc], SLICE_P,
                                      [poc - 1], [], 1)
            stream += au
            self.recs_by_poc[poc] = dict(self.last_rec.rec)
        if self.rc is not None and self.cfg.rc_stats_out \
                and self.cfg.rc_stats_out != "collect:":
            self.rc.write_stats(self.cfg.rc_stats_out)
        return bytes(stream)

    def _encode_gop_frames_parallel(self, frames, base, entries) -> bytes:
        """Frame-parallel encode of one GOP (vvenc maxParallelFrames /
        FPP analog): frames of the same temporal layer are mutually
        independent in the dyadic GOP, so each TL encodes as one parallel
        wave (the reference's TL-serial processing lists,
        EncGOP::xGetProcessingLists).  Output stays in coding order and is
        byte-identical to the serial encode."""
        from concurrent.futures import (ProcessPoolExecutor,
                                        ThreadPoolExecutor)
        cfg = self.cfg
        aus = {}
        by_tl = {}
        for e in entries:
            by_tl.setdefault(e.temporal_layer, []).append(e)
        # pool choice: THREADS when the native inter search carries the
        # work (ctypes releases the GIL) or when an accelerator is
        # attached — a fork()ed child of a process that already opened
        # the device tunnel wedges on its first device call; PROCESSES
        # only for the pure-Python CPU path (bitstream is byte-identical
        # either way — the determinism contract)
        from .. import native as _native
        import jax as _jax
        use_threads = _native.available() \
            or _jax.default_backend() != "cpu"
        pool_cls = ThreadPoolExecutor if use_threads \
            else ProcessPoolExecutor
        with pool_cls(
                max_workers=cfg.max_parallel_frames) as ex:
            for tl in sorted(by_tl):
                wave = by_tl[tl]
                jobs = []
                for e in wave:
                    poc = base + e.poc_in_gop
                    avail = {d[0] for d in self.dpb}
                    refs_l0 = [base + r for r in e.refs_past
                               if base + r in avail] or [base]
                    refs_l1 = [base + r for r in e.refs_future
                               if base + r in avail]
                    st = SLICE_B if refs_l1 else SLICE_P
                    need = sorted(set(refs_l0 + refs_l1))
                    dpb_sub = [d for d in self.dpb if d[0] in need]
                    # keep-alive RPL entries exactly as the SERIAL encode
                    # derives them: from the orchestrator's full DPB plus
                    # the wave-mates coded earlier in coding order
                    known = avail | {base + e2.poc_in_gop
                                     for e2 in entries
                                     if entries.index(e2) <
                                     entries.index(e)}
                    keep_pocs = sorted(
                        (p for p in known
                         if p in self.dpb_protect and p != poc
                         and p not in refs_l0 and p not in refs_l1),
                        key=lambda p: abs(p - poc))
                    # QPA worker inputs: display-order previous originals
                    # (post-MCTF, as the serial path feeds them), the
                    # settled min-noise stats and this POC's BIM offsets
                    prev1 = frames[poc - 1] if cfg.qpa and poc >= 1 \
                        else None
                    prev2 = frames[poc - 2] if cfg.qpa and poc >= 2 \
                        else None
                    bim_off = getattr(self, "_bim_map", {}).get(poc)
                    jobs.append((cfg, poc, frames[poc], st, refs_l0,
                                 refs_l1, e.final_qp_offset(cfg.qp),
                                 e.temporal_layer, dpb_sub, self.lmcs,
                                 keep_pocs, prev1, prev2,
                                 self.min_noise if cfg.qpa else None,
                                 bim_off))
                if len(wave) == 1:
                    from .intra_encoder import _encode_inter_frame_job
                    results = [_encode_inter_frame_job(jobs[0])]
                else:
                    from .intra_encoder import _encode_inter_frame_job
                    results = list(ex.map(_encode_inter_frame_job, jobs))
                for e, (au, rec, mf, ref_pocs, qp) in zip(wave, results):
                    poc = base + e.poc_in_gop
                    aus[poc] = au
                    self.recs_by_poc[poc] = rec
                    self.bits_by_poc[poc] = len(au) * 8
                    self.qp_by_poc[poc] = qp
                    self.slice_type_by_poc[poc] = \
                        SLICE_B if e.refs_future else SLICE_P
                    self.dpb.append((poc, rec, mf, ref_pocs, qp))
                    self._trim_dpb()
                    self.frames_done += 1
        stream = bytearray()
        for e in entries:
            stream += aus[base + e.poc_in_gop]
        # keep last_rec pointing at the last coded picture like serial
        last = PictureState(cfg.width, cfg.height, cfg.bit_depth)
        for c in range(3):
            last.rec[c][:] = self.recs_by_poc[base + entries[-1].poc_in_gop][c]
        self.last_rec = last
        return bytes(stream)

    def _encode_gop_frames_ifp(self, frames, base, entries) -> bytes:
        """Inter-frame parallelism with CTU-line sync (vvenc --ifp):
        every frame of the GOP encodes concurrently in threads; a frame's
        CTU row r waits until each reference has ifp_lines more FILTERED
        CTU rows, and motion is statically restricted to that window
        (encoder/ifp.py), so the bitstream is byte-identical for any
        worker count."""
        from concurrent.futures import ThreadPoolExecutor
        from .ifp import IfpProgress, IfpPicture
        from ..codec.motion import MotionField
        cfg = self.cfg
        ctu = cfg.ctu_size
        n_rows = (cfg.height + ctu - 1) // ctu
        prog = IfpProgress()
        for d in self.dpb:               # completed pictures: fully final
            prog.register(d[0], n_rows)
        if cfg.qpa:
            # pre-populate the display-order originals for QPA before any
            # thread starts: _encode_picture's own store would otherwise
            # race (which neighbors exist would depend on thread timing)
            shift = cfg.bit_depth - cfg.input_bit_depth
            for e in entries:
                poc = base + e.poc_in_gop
                self._orig_by_poc[poc] = {
                    c: frames[poc][c].astype(np.int32) << shift
                    for c in range(3)}
        handles = {}
        jobs = []
        for e in entries:
            poc = base + e.poc_in_gop
            avail = {d[0] for d in self.dpb}
            refs_l0 = [base + r for r in e.refs_past
                       if base + r in avail] or [base]
            refs_l1 = [base + r for r in e.refs_future
                       if base + r in avail]
            frec = {c: np.zeros_like(self.dpb[-1][1][c]) for c in range(3)}
            mf = MotionField(cfg.width, cfg.height)
            prog.register(poc, 0)
            handles[poc] = IfpPicture(prog, poc, frec, mf,
                                      sorted(set(refs_l0 + refs_l1)),
                                      cfg.ifp_lines, n_rows)
            # live DPB entry: dependents MC from frec / TMVP from mf,
            # gated by the progress table
            self.dpb.append((poc, frec, mf,
                             [list(refs_l0), list(refs_l1)],
                             self.slice_qp if poc == 0 else
                             max(0, min(63, self.cfg.qp +
                                        e.final_qp_offset(self.cfg.qp)))))
            jobs.append((e, poc, refs_l0, refs_l1))

        def run(job):
            e, poc, l0, l1 = job
            st = SLICE_B if l1 else SLICE_P
            try:
                return self._encode_picture(poc, frames[poc], st, l0, l1,
                                            e.final_qp_offset(cfg.qp),
                                            tlayer=e.temporal_layer,
                                            ifp=handles[poc])
            except BaseException as exc:
                prog.fail(exc)
                raise
        workers = max(1, cfg.max_parallel_frames or 1)
        with ThreadPoolExecutor(max_workers=workers) as ex:
            aus = list(ex.map(run, jobs))
        stream = bytearray()
        for (e, poc, _, _), au in zip(jobs, aus):
            stream += au
            self.recs_by_poc[poc] = dict(handles[poc].frec)
            self.bits_by_poc[poc] = len(au) * 8
            self.frames_done += 1
        self._trim_dpb()
        last = PictureState(cfg.width, cfg.height, cfg.bit_depth)
        for c in range(3):
            last.rec[c][:] = \
                self.recs_by_poc[base + entries[-1].poc_in_gop][c]
        self.last_rec = last
        return bytes(stream)

    def _encode_gop_segments(self, frames) -> bytes:
        """Segment-parallel random-access encode (vvenc numParallelGOPs,
        vvencCfg.h:786): the sequence splits at the intra period into
        independently-decodable IDR segments; a process pool encodes them
        concurrently.  Output is byte-identical for any worker count."""
        import copy
        from concurrent.futures import ProcessPoolExecutor
        cfg = self.cfg
        ip = cfg.intra_period
        segs = [frames[s:s + ip] for s in range(0, len(frames), ip)]
        jobs = []
        for i in range(len(segs)):
            seg_cfg = copy.copy(cfg)
            seg_cfg.intra_period = 0      # one IDR per segment
            seg_cfg.parallel_gops = 0
            # MCTF (+BIM) already ran over the WHOLE sequence in this
            # encode_sequence call — the worker must not filter again
            # (double filtering skewed the segments until round 3)
            seg_cfg.mctf = 0
            seg_cfg.lead_frames = seg_cfg.trail_frames = 0
            if cfg.rc_stats_out:
                # pass 1: segments collect in-memory; the parent merges to
                # global POCs and writes the stats file once
                seg_cfg.rc_stats_out = "collect:"
            if self.rc is not None and self.rc.stats is not None:
                # pass 2: hand each segment its global-stats slice
                # (re-indexed to local POC) and its proportional share of
                # the sequence budget (per-GOP budgeting from pass-1 data)
                s0 = i * ip
                sl = [dict(s, poc=s["poc"] - s0) for s in self.rc.stats
                      if s0 <= s["poc"] < s0 + ip]
                seg_cfg.rc_stats_data = sl
                seg_cfg.rc_stats_in = ""
                pred_total = sum(max(1, s["bits"]) for s in self.rc.stats)
                pred_seg = sum(max(1, s["bits"]) for s in sl)
                share = pred_seg / max(1, pred_total)
                seg_cfg.bitrate = int(round(
                    cfg.bitrate * share * len(frames) / max(1, len(segs[i]))))
            s0 = i * ip
            bim_seg = {p - s0: m for p, m in self._bim_map.items()
                       if s0 <= p < s0 + ip}
            jobs.append((seg_cfg, i, segs[i],
                         getattr(self, "_fgc_sei", None), bim_seg))
        workers = max(1, cfg.parallel_gops)
        stream = bytearray()
        if workers == 1:
            from .intra_encoder import _encode_gop_segment_job
            results = map(_encode_gop_segment_job, jobs)
        else:
            ex = ProcessPoolExecutor(max_workers=workers)
            from .intra_encoder import _encode_gop_segment_job
            results = ex.map(_encode_gop_segment_job, jobs)
        base = 0
        merged_stats = []
        for si, (au, recs, bits, qps, stypes, stats) in enumerate(results):
            stream += au
            for lpoc, rec in recs.items():
                self.recs_by_poc[base + lpoc] = rec
                self.bits_by_poc[base + lpoc] = bits[lpoc]
                self.qp_by_poc[base + lpoc] = qps[lpoc]
                self.slice_type_by_poc[base + lpoc] = stypes[lpoc]
            for s in stats:
                merged_stats.append(dict(s, poc=base + s["poc"]))
            base += len(segs[si])
            self.frames_done = base
        if workers > 1:
            ex.shutdown()
        if cfg.rc_stats_out and self.rc is not None:
            self.rc.collected = merged_stats
            self.rc.write_stats(cfg.rc_stats_out)
        last = PictureState(cfg.width, cfg.height, cfg.bit_depth)
        for c in range(3):
            last.rec[c][:] = self.recs_by_poc[len(frames) - 1][c]
        self.last_rec = last
        return bytes(stream)

    def _plan_prefill_ok(self) -> bool:
        """Frame-batched device RD planning applies: all-intra, fixed
        QP/lambda, QT-only dual-tree (the _use_plan scope, resolvable
        before any picture starts)."""
        cfg = self.cfg
        if cfg.device_rd == "off" or cfg.qpa or cfg.bitrate > 0 \
                or cfg.rc_stats_out or cfg.lmcs or not cfg.dual_tree \
                or self.sps.max_mtt_depth[0] != 0:
            return False
        from .. import native
        if not native.available():
            return False
        if cfg.device_rd == "auto":
            import jax
            cfg.device_rd = "on" if jax.default_backend() != "cpu" \
                else "off"
        return cfg.device_rd == "on"

    def _prefill_plans(self, frames, pocs, chunk: int = 16) -> None:
        """Build device RD plans for the given pictures in frame-batched
        device calls (ops/intra_plan.build_plans) and bank them."""
        from ..ops.intra_plan import build_plans
        cfg = self.cfg
        shift = cfg.bit_depth - cfg.input_bit_depth
        qp = self.slice_qp + 6 * (cfg.bit_depth - 8)
        implicit_mts = bool(self.sps.mts and not self.sps.mts_intra)
        with PROF.section("device.plan_prefill"):
            for c0 in range(0, len(pocs), chunk):
                sub = pocs[c0:c0 + chunk]
                srcs = [np.ascontiguousarray(
                    frames[p][0].astype(np.int32) << shift) for p in sub]
                plans = build_plans(
                    srcs, cfg.bit_depth, cfg.ctu_size,
                    int(self.sps.min_qt_size[0]), qp,
                    [self.lmbda] * len(sub), [self.lmbda_sad] * len(sub),
                    implicit_mts=implicit_mts)
                for p, pl in zip(sub, plans):
                    self._plan_bank[p] = pl.tables

    def _prefill_plans_async(self, frames, pocs) -> None:
        """Pipeline the device RD planning with the host encode: a
        producer thread runs the frame-batched device calls chunk by
        chunk while the main thread codes already-planned pictures — the
        device dispatch + d2h fetch latency overlaps host CTU coding
        (the GIL is released inside jax waits and the native ctypes
        calls).  _CtuSearcher._get_plan blocks on the per-picture event
        before consulting the bank."""
        import threading
        evs = {p: threading.Event() for p in pocs}
        self._plan_ready = evs

        def worker():
            try:
                # small first chunk so the main thread starts coding
                # early; larger chunks amortize the tunnel round-trip
                c0, chunk = 0, 2
                while c0 < len(pocs):
                    sub = pocs[c0:c0 + chunk]
                    self._prefill_plans(frames, sub, chunk=len(sub))
                    for p in sub:
                        evs[p].set()
                    c0 += chunk
                    chunk = min(chunk * 2, 8)
            finally:
                for e in evs.values():
                    e.set()  # never deadlock the encode on a device error

        threading.Thread(target=worker, daemon=True,
                         name="plan-prefill").start()

    def _encode_all_intra_parallel(self, frames) -> bytes:
        """Frame-parallel all-intra encode (vvenc maxParallelFrames
        analog): every picture is independent, so a process pool encodes
        them concurrently; the output is BYTE-IDENTICAL to the sequential
        encode (the determinism contract the reference pins with its
        threaded-vs-serial bitstream-compare tests)."""
        # Threads, not processes: the hot paths (native CTU search,
        # ALF/SAO kernels, RDOQ) are C++ ctypes calls that release the
        # GIL, so a thread pool parallelizes without the process-spawn
        # + import cost that dominates short runs.
        from concurrent.futures import ThreadPoolExecutor
        cfg = self.cfg
        shift = cfg.bit_depth - cfg.input_bit_depth
        if self._plan_prefill_ok():
            # parent does the (frame-batched) device planning; workers
            # only run the host coding — one device client, no tunnel
            # contention from the pool
            self._prefill_plans(frames, list(range(len(frames))))
        jobs = []
        for poc in range(len(frames)):
            prev = frames[poc - 1] if cfg.qpa and poc >= 1 else None
            prev2 = frames[poc - 2] if cfg.qpa and poc >= 2 else None
            jobs.append((cfg, poc, frames[poc], prev, prev2,
                         getattr(self, "_fgc_sei", None),
                         self._plan_bank.pop(poc, None)))
        stream = bytearray()
        from .intra_encoder import _encode_intra_frame_job
        with ThreadPoolExecutor(max_workers=cfg.max_parallel_frames) as ex:
            for poc, (au, rec, bits, qp) in enumerate(
                    ex.map(_encode_intra_frame_job, jobs)):
                stream += au
                self.recs_by_poc[poc] = rec
                self.bits_by_poc[poc] = bits
                self.slice_type_by_poc[poc] = SLICE_I
                self.qp_by_poc[poc] = qp
                self.frames_done = poc + 1
        # expose the final picture like the sequential path does
        last = PictureState(cfg.width, cfg.height, cfg.bit_depth)
        for c in range(3):
            last.rec[c][:] = self.recs_by_poc[len(frames) - 1][c]
        self.last_rec = last
        return bytes(stream)

