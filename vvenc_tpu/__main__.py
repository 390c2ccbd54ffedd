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
    p.add_argument("--intra-period", type=int, default=1,
                   help="1 = all-intra (round-1 build)")
    p.add_argument("--recon", default=None, help="write reconstruction YUV")
    p.add_argument("--verify", action="store_true",
                   help="decode the produced stream and verify recon match")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    w, h = (int(t) for t in args.size.lower().split("x"))

    cfg = VvencTpuConfig(width=w, height=h, qp=args.qp,
                         input_bit_depth=args.input_bitdepth,
                         intra_period=args.intra_period, gop_size=1)
    init_preset(cfg, Preset[args.preset.upper()])
    check_config(cfg)

    enc = IntraEncoder(EncoderConfig(
        width=w, height=h, qp=cfg.qp, ctu_size=cfg.ctu_size,
        min_qt=cfg.min_qt_size, input_bit_depth=cfg.input_bit_depth,
        num_full_rd_modes=cfg.num_full_rd_modes,
        max_mtt_depth=cfg.max_mtt_depth_i, deblocking=bool(cfg.deblocking),
        intra_period=cfg.intra_period))

    stats = SequenceStats(args.framerate)
    stream = bytearray()
    recs = []
    t0 = time.time()
    shift = 10 - cfg.input_bit_depth
    for fi, (y, u, v) in enumerate(read_yuv(args.input, w, h,
                                            cfg.input_bit_depth,
                                            args.frames)):
        au = enc.encode_frame((y, u, v))
        stream += au
        rec = enc.last_rec.rec
        p = (psnr(rec[0], y.astype("i4") << shift, 10),
             psnr(rec[1], u.astype("i4") << shift, 10),
             psnr(rec[2], v.astype("i4") << shift, 10))
        stats.add_frame(fi, len(au) * 8, p)
        print(f"POC {fi:5d} ( I-SLICE, QP {enc.slice_qp} ) {len(au)*8:8d} bits "
              f"[Y {p[0]:.4f} dB  U {p[1]:.4f} dB  V {p[2]:.4f} dB]")
        if args.recon:
            recs.append((rec[0], rec[1], rec[2]))

    with open(args.output, "wb") as f:
        f.write(bytes(stream))
    print("summary:", stats.summary(),
          f"| {len(stats.frames)/(time.time()-t0):.3f} fps")

    if args.recon:
        from .utils.yuv_io import write_yuv
        write_yuv(args.recon, recs, 10)
    if args.verify:
        frames = decode_stream(bytes(stream))
        import numpy as np
        ok = all(np.array_equal(fr.planes[c], rc[c])
                 for fr, rc in zip(frames, recs or
                                   [(enc.last_rec.rec[0], enc.last_rec.rec[1],
                                     enc.last_rec.rec[2])])
                 for c in range(3))
        print("verify decode:", "OK" if ok else "MISMATCH")
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
