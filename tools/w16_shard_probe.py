"""AOT memory analysis of the shard_map-tiled CCSD update at
(H2O)16/cc-pVTZ-class shape (nocc=64, nvir=848, naux=2224, fp32) over an
8-virtual-device mesh.

The round-4 measurement of the SAME shape under plain GSPMD (sharded
containers, unsharded compute) reported args = 5.0 GiB/device and
temp = 138.5 GiB/device — GSPMD gathers full tau/K/W intermediates per
device (docs/DESIGN.md "Capacity envelope").  This probe compiles the
explicit-collective tiled update (parallel/ccsd_shard) at the same shape
and prints the per-device budget; the design target is temps in the
o^2v^2/N class (~1.5 GiB units at this shape).

Usage: python tools/w16_shard_probe.py [ntile [nchunk]]
  (CPU backend, 8 virtual devices — no data is materialized.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pyscf_mpcc_tpu.parallel import make_mesh  # noqa: E402
from pyscf_mpcc_tpu.parallel import ccsd_shard  # noqa: E402

NOCC, NVIR, NAUX = 64, 848, 2224
NMO = NOCC + NVIR


def main():
    ntile = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nchunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mesh = make_mesh(8, axis_name="dp")
    row = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    f32 = jnp.float32

    def S(shape, sh):
        return jax.ShapeDtypeStruct(shape, f32, sharding=sh)

    args = (
        S((NOCC, NVIR), repl),                      # t1
        S((NOCC, NOCC, NVIR, NVIR), row),           # t2
        S((NOCC, NVIR, NOCC, NVIR), row),           # ovov
        S((NOCC, NOCC, NVIR, NVIR), row),           # oovv
        S((NOCC, NVIR, NOCC, NOCC), repl),          # ovoo
        S((NOCC,) * 4, repl),                       # oooo
        S((NAUX, NOCC, NVIR), repl),                # Lov
        S((NAUX, NVIR, NVIR), row),                 # Lvv
        S((NMO, NMO), repl),                        # fock
        S((NMO,), repl),                            # mo_energy
    )
    fn = ccsd_shard.build_update_fn(mesh, NOCC, NVIR, ntile=ntile,
                                    nchunk=nchunk)
    t0 = time.time()
    compiled = fn.lower(*args).compile()
    m = compiled.memory_analysis()
    gib = 2.0 ** 30
    # XLA reports whole-program totals for SPMD executables on the CPU
    # backend; divide by the mesh size for the per-device figure.
    n = 8
    print(f"w16 tiled update  ntile={ntile} nchunk={nchunk}  "
          f"[compile {time.time() - t0:.0f}s]")
    print(f"  per-device: temp={m.temp_size_in_bytes / n / gib:7.2f} GiB  "
          f"args={m.argument_size_in_bytes / n / gib:6.2f}  "
          f"out={m.output_size_in_bytes / n / gib:5.2f}")
    print(f"  (program totals: temp={m.temp_size_in_bytes / gib:.2f}, "
          f"args={m.argument_size_in_bytes / gib:.2f}; GSPMD round-4 "
          f"baseline at this shape: temp=138.5 GiB/device)")


if __name__ == "__main__":
    main()
