"""Persistent XLA compilation cache.

The full 512² pipeline compiles in ~1-10 min and the differentiated
spacetime chain in ~25 min on this toolchain; the persistent cache makes
every later process start instant.  Call before the first jit execution.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/tmp/dsta_jax_cache") -> None:
    import jax

    # The axon TPU plugin IGNORES the JAX_PLATFORMS env var — honor it here
    # so `JAX_PLATFORMS=cpu scripts/...` really runs on CPU instead of
    # silently grabbing the TPU (which corrupts concurrent benchmarks).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
