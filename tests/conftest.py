import os

# Tests run on a virtual multi-device CPU mesh so sharding logic is exercised
# without TPU hardware; the bench/driver run the same code on real chips.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
