import os

# Tests run on the CPU backend with x64 enabled for fp64 parity checks,
# and with 8 virtual devices so the multi-chip sharding paths are exercised
# without real hardware (mirrors the driver's dryrun environment).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
