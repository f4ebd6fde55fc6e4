import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding
# paths are exercised without TPU hardware (SURVEY.md §4e).
#
# The environment pre-imports jax with a remote-TPU ("axon") backend via
# sitecustomize, so plain JAX_PLATFORMS env vars are too late; flip the
# platform via jax.config before any backend is initialized instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (same mechanism as runtime/jax_setup.py,
# which the CLI entry points already use): the suite's wall time is
# dominated by XLA:CPU compiles of near-identical render programs, and
# repeat runs hit the cache instead.
try:
    _cache = os.path.join(
        os.environ.get("SGNERF_JAX_CACHE",
                       os.path.expanduser("~/.jax_cache")), "cpu_tests")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception as e:  # cache is an optimization, never a requirement
    print(f"[conftest] compilation cache unavailable: {e}")
