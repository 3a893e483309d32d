"""Worker for the 2-process jax.distributed smoke test (run by
test_distributed.py, never collected by pytest directly).

Each rank initializes the distributed runtime through
parallel.distributed.initialize, builds the global mesh, and
  1. psums one unit per device across BOTH processes (DCN-path collective),
  2. runs the production ladder_sharded kernel with the auxiliary axis
     sharded over the global (cross-process) mesh and checks it against
     the local einsum.
Prints 'DISTOK <rank> <ndev> <maxerr>' on success.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

rank = int(sys.argv[1])
port = sys.argv[2]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pyscf_mpcc_tpu.parallel import distributed

assert distributed.initialize(coordinator_address=f"localhost:{port}",
                              num_processes=2, process_id=rank)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pyscf_mpcc_tpu.parallel.ladder_shard import ladder_sharded

mesh = distributed.global_mesh()
ndev = mesh.devices.size
nloc = jax.local_device_count()

# --- leg 1: cross-process psum -------------------------------------------
sh = NamedSharding(mesh, P("dp"))
ones = jax.make_array_from_process_local_data(sh, np.ones((nloc,)))
total = jax.jit(shard_map(lambda a: jax.lax.psum(jnp.sum(a), "dp"),
                          mesh=mesh, in_specs=P("dp"), out_specs=P()))(ones)
assert float(total) == float(ndev), float(total)

# --- leg 2: the production sharded ladder over the global mesh ------------
rng = np.random.default_rng(7)
nocc, nvir, naux = 3, 8, 16
tau_h = rng.standard_normal((nocc, nocc, nvir, nvir))
tau_h = 0.5 * (tau_h + tau_h.transpose(1, 0, 3, 2))
ld_h = rng.standard_normal((naux, nvir, nvir))

tau = jax.make_array_from_process_local_data(NamedSharding(mesh, P()), tau_h)
ld = jax.make_array_from_process_local_data(
    sh, ld_h[rank * (naux // 2):(rank + 1) * (naux // 2)])
out = ladder_sharded(tau, ld, mesh, ntile=2)
ref = np.einsum("Lac,Lbd,ijcd->ijab", ld_h, ld_h, tau_h)
err = float(np.max(np.abs(np.asarray(out) - ref)))
assert err < 1e-11, err

print(f"DISTOK {rank} {ndev} {err:.3e}", flush=True)
