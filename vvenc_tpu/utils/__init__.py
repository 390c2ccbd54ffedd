"""Utilities: YUV file I/O, statistics."""

import os

from .yuv_io import read_yuv, write_yuv, read_y4m_header
from .stats import SequenceStats


def enable_jax_compile_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (first TPU compile of the
    preselection kernels is tens of seconds; cached runs start instantly).

    Also re-asserts JAX_PLATFORMS from the environment: some site setups
    force-select an accelerator backend via jax.config at interpreter
    start, which silently overrides the env var."""
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.path.expanduser("~/.cache/vvenc_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax: cache flags unavailable — run uncached
