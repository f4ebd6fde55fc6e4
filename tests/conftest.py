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
