import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware; the bench/driver run the same code on real chips.
# The container's axon integration force-appends its TPU platform to
# jax_platforms regardless of JAX_PLATFORMS, so override via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
