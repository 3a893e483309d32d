"""Explicitly-sharded particle-particle ladder (shard_map + psum).

The vvvv ladder's DF reconstruction sum_L Ld[L,ac] Ld[L,bd] tau[ijcd]
distributes naturally over the auxiliary axis: each device holds an naux
shard of the dressed factor, reconstructs its partial W tile, contracts
with the (replicated) tau, and the partial Ht2 results are psum-reduced
over ICI.  This is the explicit-collective counterpart of the GSPMD layout
in parallel.mesh — the replacement for the reference's MPI-ready tile
slicing (lib/cc/ccsd_t.c:856 MPICCsd_t_contract).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map


def ladder_sharded(tau, ld, mesh, axis_name="dp", ntile=1):
    """sum_{L,cd} Ld[L,a,c] Ld[L,b,d] tau[i,j,c,d] with L sharded.

    tau replicated, ld sharded over axis 0 (naux).  Returns the replicated
    Ht2 contribution [i,j,a,b].
    """
    nvir = ld.shape[1]
    ta = nvir // ntile

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name)), out_specs=P())
    def _ladder(tau_, ld_):
        def tile_fn(ld_tile):
            w = jnp.einsum("Lac,Lbd->abcd", ld_tile, ld_)
            return jnp.einsum("abcd,ijcd->ijab", w, tau_)

        naux_loc = ld_.shape[0]
        ld_t = ld_.reshape(naux_loc, ntile, ta, nvir).transpose(1, 0, 2, 3)
        out = jax.lax.map(tile_fn, ld_t)
        nocc = tau_.shape[0]
        out = out.transpose(1, 2, 0, 3, 4).reshape(nocc, nocc, nvir, nvir)
        return jax.lax.psum(out, axis_name)

    return _ladder(tau, ld)
