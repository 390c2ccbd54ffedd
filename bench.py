"""End-to-end encoder benchmark on the TPU chip (BASELINE config 1).

Encodes real frames through the FULL production pipeline — frame-level
batched intra preselection on device (ops/intra_presel.py), host RDO/
entropy with the native C++ kernels — and reports decodable-bitstream
encode throughput.  This replaces the round-1 kernel-only bench: the
metric is now the thing the mandate asks for (e2e frames/s), not a
component throughput.

Config 1 (BASELINE.md): all-intra 416x240 8-bit, 10 frames, QP 37,
preset faster.

Baseline: the reference encoder (vvencFFapp --preset faster --IntraPeriod=1
--Threads=1, same clip/config) measured on this container's CPU encodes
11.6 frames/s (10 frames in 0.861 s).  vs_baseline = ours / reference.

The first encode pass is a warmup (XLA executable load through the axon
tunnel is erratically slow, 50-350 s/program, and is a per-process one-time
cost); the reported number is the steady-state rate of the second pass.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

VVENC_FASTER_AI_416_FPS = 11.6  # measured in this container (CPU, 1 thread)

W, H, FRAMES, QP = 416, 240, 10, 37


def make_clip(path: str) -> None:
    rng = np.random.RandomState(7)
    try:
        import scipy.ndimage as ndi
        base = ndi.gaussian_filter(
            rng.randint(0, 255, (H + 64, W + 64)).astype(np.float32), 3)
    except ImportError:
        base = rng.randint(0, 255, (H + 64, W + 64)).astype(np.float32)
    base = (base - base.min()) / (base.max() - base.min()) * 200 + 20
    with open(path, "wb") as f:
        for i in range(FRAMES):
            y = base[i:i + H, 2 * i:2 * i + W].astype(np.uint8)
            u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
            v = (128 - y[::2, ::2] // 3).astype(np.uint8)
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def encode_once(clip: str, out: str) -> float:
    from vvenc_tpu.__main__ import main
    t0 = time.time()
    main(["-i", clip, "-o", out, "-s", f"{W}x{H}", "-q", str(QP),
          "-f", str(FRAMES), "--preset", "faster", "--intra-period", "1"])
    return time.time() - t0


def device_usable(timeout_s: int = 300) -> bool:
    """Probe the accelerator in a subprocess with a hard timeout: the axon
    tunnel occasionally wedges (device enumerates but a trivial matmul
    never completes), which would hang the bench forever.  On a dead
    tunnel the bench falls back to the host backend so the driver still
    gets an honest (if slower) e2e number."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128, 128));"
            "print(float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    from vvenc_tpu.utils import enable_jax_compile_cache
    enable_jax_compile_cache()
    on_chip = device_usable()
    if not on_chip:
        sys.stderr.write("bench: accelerator unusable (tunnel wedged); "
                         "falling back to host backend\n")
        os.environ["JAX_PLATFORMS"] = "cpu"
    clip = "/tmp/bench_clip.yuv"
    make_clip(clip)

    # warmup pass: compiles + loads every device program for this config
    encode_once(clip, "/tmp/bench_warm.266")
    # steady-state pass (measured)
    dt = encode_once(clip, "/tmp/bench_out.266")
    fps = FRAMES / dt

    # sanity: the produced stream must decode
    from vvenc_tpu.decoder.decoder import decode_stream
    frames = decode_stream(open("/tmp/bench_out.266", "rb").read())
    assert len(frames) == FRAMES, "bench stream failed to decode"

    where = "on one chip" if on_chip else "HOST FALLBACK (tunnel down)"
    print(json.dumps({
        "metric": ("e2e all-intra 416x240 QP37 preset-faster encode, "
                   "steady-state frames/s %s (BASELINE config 1; "
                   "vs vvencFFapp same config single-thread CPU)" % where),
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / VVENC_FASTER_AI_416_FPS, 4),
    }))


if __name__ == "__main__":
    sys.stderr.write("bench: %s\n" % os.uname().nodename)
    main()
