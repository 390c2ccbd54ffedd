"""Calibrate the device RD plan's rate proxy / split bias.

Encodes a clip at several QPs with the exact native search (ground
truth) and with the device plan under different constant settings, and
prints (bits, PSNR) pairs + a BD-rate-style delta so the constants in
ops/intra_plan.py can be pinned to the best setting.

Usage: python tools/calibrate_plan.py [clip.yuv WxH frames]
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QPS = (32, 37, 42)


def encode(clip, w, h, n, qp, env, device_rd="on"):
    e = dict(os.environ, JAX_PLATFORMS="cpu", **env)
    out = f"/tmp/cal_{qp}.266"
    r = subprocess.run(
        [sys.executable, "-m", "vvenc_tpu", "-i", clip, "-o", out,
         "-s", f"{w}x{h}", "-q", str(qp), "-f", str(n),
         "--preset", "faster", "--intra-period", "1",
         "--set", "device_rd=" + device_rd],
        capture_output=True, env=e, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    line = [ln for ln in r.stdout.decode().splitlines()
            if ln.startswith("summary:")][0]
    parts = line.split("|")
    kbps = float(parts[1].split()[0])
    ypsnr = float(parts[2].split()[1])
    return kbps, ypsnr


def bd_delta(pts_ref, pts_test):
    """Crude BD-rate: average log-bitrate delta at matched PSNR via
    piecewise-linear interpolation over the overlapping PSNR range."""
    pr = sorted(pts_ref, key=lambda p: p[1])
    pt = sorted(pts_test, key=lambda p: p[1])
    lo = max(pr[0][1], pt[0][1])
    hi = min(pr[-1][1], pt[-1][1])
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 50)

    def lr(pts, y):
        ys = [p[1] for p in pts]
        bs = [np.log(p[0]) for p in pts]
        return np.interp(y, ys, bs)
    d = np.mean([lr(pt, y) - lr(pr, y) for y in xs])
    return float(np.expm1(d) * 100)


def main():
    if len(sys.argv) > 1:
        clip, size, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
        w, h = (int(t) for t in size.split("x"))
    else:
        clip, w, h, n = "/tmp/bench_clip.yuv", 416, 240, 10
    variants = {
        "exact": {},
        "plan-default": {},
        "plan-k3": {"VVENC_TPU_PLAN_K": "3"},
        "plan-split2": {"VVENC_TPU_PLAN_SPLIT": "2.0"},
        "plan-split4": {"VVENC_TPU_PLAN_SPLIT": "4.0"},
        "plan-c2lo": {"VVENC_TPU_PLAN_C2": "1.4"},
        "plan-c2hi": {"VVENC_TPU_PLAN_C2": "2.6"},
    }
    results = {}
    for name, env in variants.items():
        pts = [encode(clip, w, h, n, qp, env,
                      device_rd="off" if name == "exact" else "on")
               for qp in QPS]
        results[name] = pts
        print(name, [(round(b, 1), round(p, 3)) for b, p in pts],
              flush=True)
    ref = results["exact"]
    for name, pts in results.items():
        if name == "exact":
            continue
        print("%-14s BD-rate vs exact: %+.2f%%" % (name,
                                                   bd_delta(ref, pts)))


if __name__ == "__main__":
    main()
