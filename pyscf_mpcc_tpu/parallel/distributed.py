"""Multi-host (DCN) initialization helpers.

TPU-native replacement for the reference's external-MPI hook
(lib/cc/ccsd_t.c:856 MPICCsd_t_contract, consumed by mpi4pyscf): pods are
driven through `jax.distributed` + a global mesh; every sharded kernel in
this framework (parallel.mesh, parallel.ladder_shard, the (T) tile scan)
then runs unchanged over ICI within a slice and DCN across slices.

Single-host environments (including the CI virtual-device mesh) skip
initialization transparently.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed when running under a multi-host launcher.

    All arguments default to the standard environment variables
    (JAX_COORDINATOR_ADDRESS etc. / TPU pod runtime auto-detection); no-op
    when single-process."""
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis_name="dp"):
    """A 1-D mesh over every device in the (possibly multi-host) job."""
    return Mesh(np.array(jax.devices()), (axis_name,))
