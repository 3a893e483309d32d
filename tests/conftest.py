import os

# Tests run on the CPU backend with x64 enabled for fp64 parity checks,
# and with 8 virtual devices so the multi-chip sharding paths are exercised
# without real hardware (mirrors the driver's dryrun environment).
#
# NOTE: this environment pre-imports jax at interpreter startup
# (sitecustomize), so JAX_* environment variables set here are too late --
# configure through jax.config instead, before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
