"""Execute the shard_map-tiled CCSD update at a beyond-GSPMD shape.

Two-part capacity evidence for the mesh axis (VERDICT r4 missing #1):

1. AOT memory accounting of the plain GSPMD fused update
   (parallel.mesh.sharded_update_amps — sharded containers, XLA-chosen
   collectives) at an (H2O)10/cc-pVTZ-class shape: per-device temps
   exceed one v5e HBM (16 GiB), i.e. GSPMD cannot run this shape on a
   real 8-chip mesh, and its whole-program footprint exceeds this
   host's 125 GiB RAM, i.e. it cannot even be executed on the virtual
   CPU mesh.

2. The explicit-collective tiled update (parallel.ccsd_shard) EXECUTES
   at that same shape on the 8-virtual-device host mesh — completing
   inside the host's RAM is the in-practice proof that no device ever
   materializes a GSPMD-class temp — and its outputs are finite with
   the t2 pair symmetry r2[i,j,a,b] = r2[j,i,b,a] intact (the update's
   invariant; checked to fp32 tolerance).

Usage: python tools/capacity_exec_probe.py [--exec] [--gspmd-aot]
  (CPU backend, 8 virtual devices.  --exec takes ~10-30 min on one
  core; default runs both parts.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices timeshare this host's ONE core: ring steps at this
# shape take minutes each, far beyond XLA:CPU's default 40 s collective
# rendezvous hard-abort (a liveness guard, not a correctness bound —
# the real-chip mesh runs steps concurrently and never waits like this)
flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=7200"
          " --xla_cpu_collective_call_terminate_timeout_seconds=14400"
          " --xla_cpu_collective_timeout_seconds=14400")
os.environ["XLA_FLAGS"] = flags

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pyscf_mpcc_tpu.cc.eris import RERIs  # noqa: E402
from pyscf_mpcc_tpu.parallel import make_mesh, ccsd_shard, mesh as gspmd  # noqa: E402

# (H2O)10/cc-pVTZ-class (frozen core): nocc=40, nvir~540 -> 512 here
# keeps tile divisibility; naux ~ 3.3x nao.  The o^2v^2 block is
# 1.56 GiB fp32; four of them + DIIS would still fit one chip, but the
# GSPMD *temps* at this shape do not (part 1's measurement).
NOCC = int(os.environ.get("CAP_NOCC", "40"))
NVIR = int(os.environ.get("CAP_NVIR", "512"))
NAUX = int(os.environ.get("CAP_NAUX", "1344"))
NMO = NOCC + NVIR
GIB = 2.0 ** 30


def _aot_gspmd():
    mesh = make_mesh(8)
    row = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    f32 = jnp.float32

    def S(shape, sh):
        return jax.ShapeDtypeStruct(shape, f32, sharding=sh)

    eris = RERIs(
        fock=S((NMO, NMO), repl), mo_energy=S((NMO,), repl),
        oooo=S((NOCC,) * 4, repl), ovoo=S((NOCC, NVIR, NOCC, NOCC), repl),
        ovov=S((NOCC, NVIR, NOCC, NVIR), row),
        oovv=S((NOCC, NOCC, NVIR, NVIR), row),
        ovvo=S((NOCC, NVIR, NVIR, NOCC), row), ovvv=None, vvvv=None,
        Lov=S((NAUX, NOCC, NVIR), repl), Lvv=S((NAUX, NVIR, NVIR), row),
        Loo=S((NAUX, NOCC, NOCC), repl),
    )
    t1 = S((NOCC, NVIR), repl)
    t2 = S((NOCC, NOCC, NVIR, NVIR), row)
    fn = gspmd.sharded_update_amps(mesh)
    t0 = time.time()
    compiled = jax.jit(fn).lower(t1, t2, eris).compile()
    m = compiled.memory_analysis()
    print(f"GSPMD fused update AOT @ (o={NOCC}, v={NVIR}, aux={NAUX}) "
          f"[compile {time.time() - t0:.0f}s]")
    print(f"  per-device: temps={m.temp_size_in_bytes / 8 / GIB:7.2f} GiB"
          f"  args={m.argument_size_in_bytes / 8 / GIB:6.2f} GiB"
          f"  (v5e HBM = 16 GiB)")
    print(f"  whole-program: {(m.temp_size_in_bytes + m.argument_size_in_bytes) / GIB:.1f}"
          f" GiB (host RAM = 125 GiB)", flush=True)


def _exec_tiled(ntile=32, nchunk=4):
    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    f32 = np.float32

    def R(*shape, scale=1e-2):
        return (rng.standard_normal(shape) * scale).astype(f32)

    mo_e = np.sort(rng.standard_normal(NMO)).astype(f32)
    mo_e[:NOCC] -= 2.0
    mo_e[NOCC:] += 2.0
    fock = np.diag(mo_e).astype(f32)
    ovov = R(NOCC, NVIR, NOCC, NVIR)
    ovov = 0.5 * (ovov + ovov.transpose(2, 3, 0, 1))
    oovv = R(NOCC, NOCC, NVIR, NVIR)
    oovv = 0.5 * (oovv + oovv.transpose(1, 0, 3, 2))
    oooo = R(NOCC, NOCC, NOCC, NOCC)
    oooo = 0.5 * (oooo + oooo.transpose(2, 3, 0, 1))
    t2 = R(NOCC, NOCC, NVIR, NVIR)
    t2 = 0.5 * (t2 + t2.transpose(1, 0, 3, 2))
    eris = RERIs(
        fock=jnp.asarray(fock), mo_energy=jnp.asarray(mo_e),
        oooo=jnp.asarray(oooo), ovoo=jnp.asarray(R(NOCC, NVIR, NOCC, NOCC)),
        ovov=jnp.asarray(ovov), oovv=jnp.asarray(oovv),
        ovvo=None, ovvv=None, vvvv=None,
        Lov=jnp.asarray(R(NAUX, NOCC, NVIR)),
        Lvv=jnp.asarray(R(NAUX, NVIR, NVIR)),
        Loo=jnp.asarray(R(NAUX, NOCC, NOCC)),
    )
    t1 = jnp.asarray(R(NOCC, NVIR))
    t2 = jnp.asarray(t2)
    eris_sh = ccsd_shard.shard_eris_tiled(eris, mesh)
    t1s, t2s = ccsd_shard.shard_amps_tiled(t1, t2, mesh)
    t0 = time.time()
    t1n, t2n = ccsd_shard.update_amps_tiled(
        t1s, t2s, eris_sh, mesh, ntile=ntile, nchunk=nchunk)
    t1n.block_until_ready()
    wall = time.time() - t0
    t2h = np.asarray(jax.device_get(t2n))
    sym = np.abs(t2h - t2h.transpose(1, 0, 3, 2)).max()
    print(f"tiled update EXECUTED @ (o={NOCC}, v={NVIR}, aux={NAUX}) "
          f"ntile={ntile} nchunk={nchunk}")
    print(f"  wall {wall:.0f}s (compile+run, 8 virtual devices on 1 host"
          f" core); finite={np.isfinite(t2h).all()}  "
          f"max|t2 - t2^(jiba)| = {sym:.3e}", flush=True)
    assert np.isfinite(t2h).all() and sym < 1e-4


if __name__ == "__main__":
    do_exec = "--gspmd-aot" not in sys.argv or "--exec" in sys.argv
    do_aot = "--exec" not in sys.argv or "--gspmd-aot" in sys.argv
    if do_aot:
        _aot_gspmd()
    if do_exec:
        _exec_tiled()
