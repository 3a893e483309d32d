"""Mesh-sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from pyscf_mpcc_tpu.cc import rccsd
from pyscf_mpcc_tpu.parallel import (make_mesh, shard_amps, shard_eris,
                                     sharded_update_amps)
from pyscf_mpcc_tpu.parallel.ladder_shard import ladder_sharded


def test_sharded_update_matches_single_device():
    eris = ge._synthetic_eris(nocc=8, nvir=16, naux=32, dtype=jnp.float64)
    eris = eris._replace(ovvv=None)
    _, t1, t2 = rccsd.init_amps(eris)
    ref1, ref2 = rccsd.update_amps(t1, t2, eris)

    mesh = make_mesh(8)
    eris_s = shard_eris(eris, mesh)
    t1s, t2s = shard_amps(t1, t2, mesh)
    upd = sharded_update_amps(mesh)
    with mesh:
        o1, o2 = upd(t1s, t2s, eris_s)
    assert np.abs(np.asarray(o1) - np.asarray(ref1)).max() < 1e-12
    assert np.abs(np.asarray(o2) - np.asarray(ref2)).max() < 1e-12


def test_shard_map_ladder_matches_local():
    rng = np.random.RandomState(0)
    naux, nvir, nocc = 64, 16, 6
    ld = jnp.asarray(rng.randn(naux, nvir, nvir) * 0.1)
    tau = jnp.asarray(rng.randn(nocc, nocc, nvir, nvir) * 0.1)
    ref = jnp.einsum("Lac,Lbd,ijcd->ijab", ld, ld, tau)
    mesh = make_mesh(8)
    out = ladder_sharded(tau, ld, mesh, ntile=2)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-10


def test_graft_entry_dryrun():
    ge.dryrun_multichip(8)


def test_sharded_ccsd_t_matches_single_device():
    import jax.numpy as jnp2
    from pyscf_mpcc_tpu.cc import ccsd_t, eris as eris_mod, rccsd
    from pyscf_mpcc_tpu.testutil import h2o_ccpvdz
    d = h2o_ccpvdz(geom="tilt")
    er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                   d["fock_ao"], 5)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-11, conv_tol_normt=1e-9,
                                   max_cycle=200)
    assert conv
    e_single = ccsd_t.kernel(t1, t2, er, tile=5)
    mesh = make_mesh(8)
    e_sharded = ccsd_t.kernel(t1, t2, er, tile=5, mesh=mesh)
    assert abs(e_single - e_sharded) < 1e-12
