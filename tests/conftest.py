"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU required).

Mirrors the reference test philosophy (vvenc cmake/modules/vvencTests.cmake):
kernel-vs-reference equivalence and bitstream round-trip tests must pass on
any host; TPU benchmarks are separate (bench.py).
"""

import os

# force CPU for unit tests even when the session env points at a TPU
# (bench.py is the TPU entry point); must be set before jax imports
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
