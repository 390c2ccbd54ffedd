"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU required).

The environment's axon sitecustomize force-selects the TPU backend via
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
overrides JAX_PLATFORMS env — so we must override the config again here.
bench.py is the TPU entry point; unit tests are CPU-only and fast.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
