"""CLI encoder app (vvencapp analog): python -m vvenc_tpu [options].

Easy mode: preset + size + QP.  Example:
  python -m vvenc_tpu -i in.yuv -s 416x240 -q 37 --preset faster -o out.266
"""

from __future__ import annotations

import argparse
import sys
import time

from .config import VvencTpuConfig, Preset, init_preset, check_config
from .encoder import IntraEncoder, EncoderConfig
from .utils.yuv_io import read_yuv
from .utils.stats import SequenceStats, psnr
from .utils.msglog import LOG
from .decoder import decode_stream


def parse_args(argv):
    p = argparse.ArgumentParser(
        prog="vvenc_tpu",
        description="TPU-native H.266/VVC encoder (vvenc-capability rebuild)")
    p.add_argument("-i", "--input", required=True, help="input YUV (planar 4:2:0)")
    p.add_argument("-o", "--output", required=True, help="output .266 bitstream")
    p.add_argument("-s", "--size", required=True, help="WxH, e.g. 416x240")
    p.add_argument("-q", "--qp", type=int, default=32)
    p.add_argument("-r", "--framerate", type=float, default=30.0)
    p.add_argument("-f", "--frames", type=int, default=None)
    p.add_argument("--preset", default="faster",
                   choices=[x.name.lower() for x in Preset])
    p.add_argument("--input-bitdepth", type=int, default=8, choices=[8, 10])
    p.add_argument("--internal-bitdepth", type=int, default=10,
                   choices=[8, 10],
                   help="internal coding bit depth (vvenc "
                        "--internal-bitdepth)")
    p.add_argument("--packed-input", action="store_true",
                   help="packed 10-bit planar input (4 samples / 5 "
                        "bytes; vvenc --packedinput analog)")
    p.add_argument("--msb-extended-bitdepth", type=int, default=0,
                   help="file samples carry this bit depth inside the "
                        "container depth; MSB-extend to the internal "
                        "coding depth (YuvFileIO MSBExtendedBitDepth)")
    p.add_argument("--intra-period", type=int, default=1,
                   help="1 = all-intra; 0 = single IDR then inter")
    p.add_argument("--gop-size", type=int, default=None,
                   help="hierarchical-B GOP size (power of two; "
                        "1 = low-delay IPPP; default: 16 when inter)")
    p.add_argument("--recon", default=None, help="write reconstruction YUV")
    p.add_argument("--segment", default="off",
                   choices=["off", "first", "mid", "last"],
                   help="segment-concatenation position (vvenc "
                        "SegmentMode): encode one restartable chunk of "
                        "a long sequence; MCTF lead/trail context frames "
                        "are read around the coded range automatically")
    p.add_argument("--skip", type=int, default=0,
                   help="skip this many input frames before the first "
                        "coded frame (segment start position)")
    p.add_argument("--qpa", type=int, default=None, choices=[0, 1],
                   help="perceptual QP adaptation (default: config)")
    p.add_argument("--bitrate", type=int, default=0,
                   help="target bitrate in bps (0 = fixed QP)")
    p.add_argument("--passes", type=int, default=1, choices=[1, 2],
                   help="rate-control passes (2 = two-pass VBR)")
    p.add_argument("--rc-statsfile", default=None,
                   help="two-pass stats file (default: <output>.rcstats)")
    p.add_argument("--picture-hash", type=int, default=0,
                   choices=[0, 1, 2, 3],
                   help="decoded-picture-hash SEI (1=MD5, 2=CRC, 3=checksum)")
    p.add_argument("--sei-timing", action="store_true",
                   help="emit buffering-period/pic-timing SEIs")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="expert string-param API (vvenc_set_param analog)")
    p.add_argument("--threads", type=int, default=-1,
                   help="worker-thread budget (-1 = auto from size, the "
                        "reference's default behavior; 0/1 = single)")
    p.add_argument("--mt-profile", action="store_true",
                   help="auto-enable WPP/IFP/tiles from the thread budget "
                        "(vvenc mtProfile analog)")
    p.add_argument("-rs", "--refreshsec", type=float, default=0.0,
                   help="intra period in seconds (rounded to GOP)")
    p.add_argument("--wpp", action="store_true",
                   help="WPP: per-CTU-row substreams + entry points")
    p.add_argument("--ifp", action="store_true",
                   help="inter-frame parallelism (CTU-line-synchronized "
                        "frame threads; motion statically restricted)")
    p.add_argument("--verify", action="store_true",
                   help="decode the produced stream and verify recon match")
    return p.parse_args(argv)


def encoder_config_from(cfg, args) -> "EncoderConfig":
    """Map the flat config onto the live encoder's parameters."""
    return EncoderConfig(
        width=cfg.width, height=cfg.height, qp=cfg.qp,
        ctu_size=cfg.ctu_size, min_qt=cfg.min_qt_size,
        input_bit_depth=cfg.input_bit_depth,
        bit_depth=cfg.internal_bit_depth,
        num_full_rd_modes=cfg.num_full_rd_modes,
        num_chroma_rd_modes=cfg.num_chroma_rd_modes,
        drap_period=cfg.drap_period,
        max_mtt_depth=cfg.max_mtt_depth_i, deblocking=bool(cfg.deblocking),
        intra_period=cfg.intra_period, gop_size=cfg.gop_size,
        dep_quant=bool(cfg.dep_quant),
        sign_data_hiding=bool(cfg.sign_data_hiding),
        qpa=bool(cfg.perceptual_qpa),
        sao=bool(cfg.sao), alf=bool(cfg.alf), ccalf=bool(cfg.ccalf),
        alf_nonlinear=bool(cfg.alf_nonlinear),
        mctf=bool(cfg.mctf), bim=bool(cfg.bim),
        lfnst=bool(cfg.lfnst), mts=bool(cfg.mts),
        mts_implicit=bool(cfg.mts_implicit), mip=bool(cfg.mip),
        mrl=bool(cfg.mrl), cclm=bool(cfg.lm_chroma), tmvp=bool(cfg.tmvp),
        dual_tree=bool(cfg.dual_i_tree),
        wpp=bool(cfg.wpp),
        max_parallel_frames=cfg.max_parallel_frames,
        wpp_search_workers=(cfg.threads if cfg.threads > 0 else 0),
        ifp=bool(cfg.ifp), ifp_lines=cfg.ifp_lines,
        lookahead=bool(cfg.look_ahead),
        bdof=bool(cfg.bdof), dmvr=bool(cfg.dmvr),
        jccr=bool(cfg.joint_cbcr), isp=bool(cfg.isp), mmvd=bool(cfg.mmvd),
        smvd=bool(cfg.smvd), bcw=bool(cfg.bcw), ciip=bool(cfg.ciip),
        amvr=bool(cfg.amvr), geo=bool(cfg.geo), sbt=bool(cfg.sbt),
        transform_skip=cfg.transform_skip == 1, bdpcm=cfg.bdpcm == 1,
        ibc=cfg.ibc == 1,
        sbtmvp=bool(cfg.sbtmvp), affine=bool(cfg.affine),
        prof=bool(cfg.prof),
        scc_auto=cfg.transform_skip == 2,
        lmcs=cfg.lmcs, lmcs_update_ctrl=cfg.lmcs_update_ctrl,
        lmcs_offset=cfg.lmcs_offset,
        tile_cols=max(1, cfg.num_tile_cols),
        tile_rows=max(1, cfg.num_tile_rows),
        parallel_gops=cfg.num_parallel_gops,
        bitrate=cfg.target_bitrate, max_bitrate=cfg.max_bitrate,
        rc_stats_out=cfg.rc_stats_out, rc_stats_in=cfg.rc_stats_in,
        lead_frames=cfg.lead_frames, trail_frames=cfg.trail_frames,
        picture_hash=cfg.picture_hash,
        hrd_timing_sei=bool(cfg.hrd_timing_sei),
        fps_num=cfg.fps_num, fps_den=cfg.fps_den,
        intra_presel=cfg.intra_presel, device_rd=cfg.device_rd,
        me_mode=cfg.me_mode,
        search_range=cfg.search_range,
        num_refs=cfg.num_refs,
        start_offset=getattr(args, "skip", 0) if args is not None else 0)


def main(argv=None):
    from .utils import enable_jax_compile_cache
    enable_jax_compile_cache()
    args = parse_args(argv if argv is not None else sys.argv[1:])
    w, h = (int(t) for t in args.size.lower().split("x"))

    all_intra = args.intra_period == 1
    gop_size = args.gop_size if args.gop_size is not None else \
        (1 if all_intra else 16)
    cfg = VvencTpuConfig(width=w, height=h, qp=args.qp,
                         input_bit_depth=args.input_bitdepth,
                         internal_bit_depth=args.internal_bitdepth,
                         intra_period=args.intra_period, gop_size=gop_size,
                         target_bitrate=args.bitrate, rc_passes=args.passes,
                         picture_hash=args.picture_hash,
                         hrd_timing_sei=1 if args.sei_timing else 0,
                         fps_num=int(round(args.framerate)), fps_den=1)
    init_preset(cfg, Preset[args.preset.upper()])
    if args.qpa is not None:
        cfg.perceptual_qpa = args.qpa
    if args.wpp:
        cfg.wpp = 1
    if args.ifp:
        cfg.ifp = 1
    if args.refreshsec:
        cfg.refresh_sec = args.refreshsec
    if args.mt_profile:
        cfg.mt_profile = 1
    if args.segment != "off":
        cfg.segment_mode = args.segment
    if args.threads:
        cfg.threads = args.threads
    from .config.config import set_param, apply_derived
    for kv in args.set:
        k, _, v = kv.partition("=")
        set_param(cfg, k, v)
    apply_derived(cfg)
    if not cfg.mt_profile and cfg.threads > 0 \
            and cfg.max_parallel_frames == 0:
        cfg.max_parallel_frames = cfg.threads
    check_config(cfg)

    stats = SequenceStats(args.framerate)
    shift = cfg.internal_bit_depth - cfg.input_bit_depth
    lead = min(cfg.lead_frames, args.skip)
    n_read = None if args.frames is None else \
        lead + args.frames + cfg.trail_frames
    if args.packed_input:
        from .utils.yuv_io import read_yuv_packed10
        if cfg.input_bit_depth != 10:
            p.error("--packed-input requires --input-bitdepth 10")
        frames = list(read_yuv_packed10(args.input, w, h, n_read,
                                        start=args.skip - lead))
    else:
        frames = list(read_yuv(args.input, w, h, cfg.input_bit_depth,
                               n_read, start=args.skip - lead))
    if args.msb_extended_bitdepth:
        from .utils.yuv_io import msb_extend
        mb = args.msb_extended_bitdepth
        frames = [tuple(msb_extend(pl, mb, cfg.input_bit_depth)
                        for pl in f) for f in frames]
    if args.frames is not None and cfg.trail_frames:
        # fewer trail frames than derived near the end of the file
        short = lead + args.frames + cfg.trail_frames - len(frames)
        if short > 0:
            cfg.trail_frames = max(0, cfg.trail_frames - short)
    elif args.frames is None and cfg.trail_frames:
        # no -f: the segment extends to end-of-file, so there is no later
        # segment that would code trailing frames — coding must cover the
        # whole read range (otherwise the last trail_frames real frames
        # would silently be used as MCTF context only and never coded)
        cfg.trail_frames = 0
    cfg.lead_frames = lead
    t0 = time.time()
    if cfg.rc_passes == 2 and cfg.target_bitrate:
        # two-pass: pass 1 collects stats (vvenc_init_pass analog), pass 2
        # encodes against them (vvencapp.cpp:293 pass loop)
        statsf = args.rc_statsfile or (args.output + ".rcstats")
        ecfg1 = encoder_config_from(cfg, args)
        ecfg1.rc_stats_out = statsf
        ecfg1.num_full_rd_modes = 1      # FIRSTPASS-preset-style fast pass
        IntraEncoder(ecfg1).encode_sequence(frames)
        ecfg2 = encoder_config_from(cfg, args)
        ecfg2.rc_stats_in = statsf
        enc = IntraEncoder(ecfg2)
    else:
        enc = IntraEncoder(encoder_config_from(cfg, args))
    if args.segment in ("mid", "last"):
        # concatenation: parameter sets come from the FIRST segment
        # (byte-identity with the one-shot encode; the reference's
        # segment chunks concatenate the same way)
        enc._headers = b""
    stream = enc.encode_sequence(frames)
    elapsed = time.time() - t0
    for poc in sorted(enc.recs_by_poc):
        rec = enc.recs_by_poc[poc]
        # segment mode: coded POC 0 is frames[lead_frames]
        y, u, v = frames[cfg.lead_frames + poc]
        p = (psnr(rec[0], y.astype("i4") << shift,
                  cfg.internal_bit_depth),
             psnr(rec[1], u.astype("i4") << shift,
                  cfg.internal_bit_depth),
             psnr(rec[2], v.astype("i4") << shift,
                  cfg.internal_bit_depth))
        bits = enc.bits_by_poc.get(poc, 0)
        st = enc.slice_type_by_poc.get(poc, 2)
        stats.add_frame(poc, bits, p)
        LOG.info(f"POC {poc:5d} ( {'BPI'[st]}-SLICE, QP "
                 f"{enc.qp_by_poc.get(poc, enc.slice_qp)} ) {bits:8d} bits "
                 f"[Y {p[0]:.4f} dB  U {p[1]:.4f} dB  V {p[2]:.4f} dB]")

    with open(args.output, "wb") as f:
        f.write(stream)
    LOG.info("summary: %s | %.3f fps", stats.summary(),
             len(stats.frames) / elapsed)
    from .utils.profiler import PROF
    PROF.report()

    if args.recon:
        from .utils.yuv_io import write_yuv
        recs = [tuple(enc.recs_by_poc[poc][c] for c in range(3))
                for poc in sorted(enc.recs_by_poc)]
        write_yuv(args.recon, recs, 10)
    if args.verify:
        import numpy as np
        # POC restarts at every IDR (GOP segments): map each decoded
        # frame to a global display index = segment base + local POC
        decoded = decode_stream(stream)
        globs = []
        seg_base = 0
        seen_in_seg = 0
        for fr in decoded:
            if fr.poc == 0 and seen_in_seg > 0:
                seg_base += seen_in_seg
                seen_in_seg = 0
            seen_in_seg += 1
            globs.append((seg_base + fr.poc, fr))
        globs.sort(key=lambda t: t[0])
        by_poc = sorted(enc.recs_by_poc)
        ok = (len(globs) == len(by_poc)) and all(
            np.array_equal(fr.planes[c], enc.recs_by_poc[poc][c])
            for (g, fr), poc in zip(globs, by_poc) for c in range(3))
        print("verify decode:", "OK" if ok else "MISMATCH")
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
