"""Process-level JAX configuration: persistent compilation cache.

The TPU backend in this environment compiles remotely and slowly (minutes for
the large query/render programs); the persistent cache turns every repeat
compile into a ~50 ms disk hit. Call `setup()` early in every entry point.
"""
from __future__ import annotations

import os

_DONE = False


def setup(cache_dir: str = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax
    cache_dir = cache_dir or os.environ.get(
        "SGNERF_JAX_CACHE", os.path.expanduser("~/.jax_cache"))
    # separate per platform: CPU reusing TPU-era entries triggers loud XLA
    # machine-feature-mismatch warnings. Read the env (NOT
    # jax.default_backend(), which would initialize and lock the platform
    # before dryrun_multichip can flip to CPU).
    plat = os.environ.get("JAX_PLATFORMS", "default") or "default"
    cache_dir = os.path.join(cache_dir, plat.replace(",", "_"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover
        print(f"[jax_setup] compilation cache unavailable: {e}")
