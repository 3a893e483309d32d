"""Device-mesh parallelism for the CC stack.

TPU-native replacement for the reference's concurrency mechanisms
(SURVEY.md section 2.6: OpenMP tile loops in lib/cc/ccsd_t.c, the
MPI-ready slicing of MPICCsd_t_contract, HDF5 out-of-core streaming):
everything becomes sharded device arrays over a `jax.sharding.Mesh`, with
XLA's SPMD partitioner inserting the ICI collectives.

Round-1 layout (single mesh axis ``dp``):
- t2, tau sharded over the first occupied axis (row parallel),
- the DF factor Lvv sharded over the auxiliary axis for the particle-
  particle ladder (psum over aux shards),
- small blocks (fock, oooo, ovov, ...) replicated.

The same jitted ``update_amps`` from cc.rccsd is used; only in/out
shardings differ.  Multi-host extension: `jax.distributed.initialize` +
the same constructions over a bigger mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyscf_mpcc_tpu.cc import rccsd
from pyscf_mpcc_tpu.cc.eris import RERIs


def make_mesh(n_devices=None, axis_name="dp", devices=None):
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def _repl(mesh):
    return NamedSharding(mesh, P())


def shard_eris(eris: RERIs, mesh, axis_name="dp"):
    """Place the ERI container on the mesh: Lvv sharded over aux, the large
    four-index blocks sharded over their first occupied axis, small blocks
    replicated."""
    row = NamedSharding(mesh, P(axis_name))
    repl = _repl(mesh)

    def put(x, sh):
        if x is None:
            return None
        return jax.device_put(x, sh)

    return RERIs(
        fock=put(eris.fock, repl),
        mo_energy=put(eris.mo_energy, repl),
        oooo=put(eris.oooo, repl),
        ovoo=put(eris.ovoo, repl),
        ovov=put(eris.ovov, repl),
        oovv=put(eris.oovv, repl),
        ovvo=put(eris.ovvo, repl) if eris.ovvo is not None else None,
        ovvv=put(eris.ovvv, row) if eris.ovvv is not None else None,
        vvvv=put(eris.vvvv, repl),
        Lvv=put(eris.Lvv, row),   # shard over naux
        Lov=put(eris.Lov, row),
        Loo=put(eris.Loo, row),
    )


def shard_amps(t1, t2, mesh, axis_name="dp"):
    """t1 replicated; t2 sharded over the first occupied axis."""
    repl = _repl(mesh)
    row = NamedSharding(mesh, P(axis_name))
    return jax.device_put(t1, repl), jax.device_put(t2, row)


def sharded_update_amps(mesh, axis_name="dp", ntile=1):
    """A jitted update_amps whose outputs keep the row sharding of t2."""
    repl = _repl(mesh)
    row = NamedSharding(mesh, P(axis_name))

    fn = partial(rccsd.update_amps, ntile=ntile)
    return jax.jit(fn, out_shardings=(repl, row))


# ------------------------------------------------------------ UCCSD
def shard_ueris(ueris, mesh, axis_name="dp"):
    """Place a UERIs container on the mesh: per-spin DF factors sharded
    over naux (same layout as the RCCSD path), materialized three-virtual
    blocks sharded over their first occupied axis, the o^2v^2-class
    blocks replicated."""
    row = NamedSharding(mesh, P(axis_name))
    repl = _repl(mesh)

    def put(x, sh):
        return None if x is None else jax.device_put(x, sh)

    kw = {f: put(getattr(ueris, f), repl) for f in ueris._fields
          if getattr(ueris, f) is not None}
    for f in ("Lov_a", "Lvv_a", "Lov_b", "Lvv_b",
              "ovvv", "OVVV", "ovVV", "OVvv"):
        if getattr(ueris, f) is not None:
            kw[f] = put(getattr(ueris, f), row)
    return type(ueris)(**kw)


def shard_uamps(t1, t2, mesh, axis_name="dp"):
    """(t1a,t1b) replicated; each of (t2aa,t2ab,t2bb) sharded over its
    first occupied axis."""
    repl = _repl(mesh)
    row = NamedSharding(mesh, P(axis_name))
    return (tuple(jax.device_put(x, repl) for x in t1),
            tuple(jax.device_put(x, row) for x in t2))


def sharded_uccsd_update(mesh, axis_name="dp", ntile=1):
    """A jitted UCCSD update_amps keeping the row sharding of the t2
    triple (the same-spin ladders ride the pair-mirrored sharded ladder
    inside; XLA inserts the aux-shard psums)."""
    from pyscf_mpcc_tpu.cc import uccsd

    repl = _repl(mesh)
    row = NamedSharding(mesh, P(axis_name))
    fn = partial(uccsd.update_amps, ntile=ntile)
    return jax.jit(fn, out_shardings=((repl,) * 2, (row,) * 3))
