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

# The persistent compilation cache is DISABLED under pytest: on this
# round's runtime, serializing certain CPU executables segfaults inside
# jax's put_executable_and_time (reproduced twice at the same suite
# position, round 5) — a crash in the cache WRITE path, not in any
# test.  Production drivers keep the cache; tests trade warm-up time
# for determinism.
os.environ["PYSCF_MPCC_TPU_COMPILATION_CACHE_DIR"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def clean_child_env(**extra):
    """Environment for subprocess tests: force the CPU backend and strip
    any experimental accelerator-plugin wiring (plugin site dirs on
    PYTHONPATH and their env vars) so the child never tries to
    initialize a tunneled device platform and hang."""
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith(("AXON_", "PALLAS_AXON", "TPU_"))
                   or k == "LIBTPU_INIT_ARGS")}
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon_site" not in p]
    if pp:
        env["PYTHONPATH"] = os.pathsep.join(pp)
    else:
        env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra)
    return env
