"""Lambda-CCSD (via jax.vjp of the residual) and response RDMs.

Validation strategy (no external oracle needed — the properties below are
exact identities): Lambda stationarity, tr(rdm1) = N, and total-energy
reconstruction E = h.rdm1 + 1/2 g.rdm2 + E_nuc."""

import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu import ao2mo
from pyscf_mpcc_tpu.cc import eris as eris_mod, lambda_ad, rccsd
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz


def _solve():
    d = h2o_ccpvdz()
    er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                   d["fock_ao"], 5)
    conv, e_corr, t1, t2 = rccsd.kernel(er, conv_tol=1e-12,
                                        conv_tol_normt=1e-10, max_cycle=200)
    assert conv
    return d, er, e_corr, t1, t2


def test_lambda_and_rdm_energy_consistency():
    d, er, e_corr, t1, t2 = _solve()
    convl, l1, l2 = lambda_ad.kernel(t1, t2, er, conv_tol=1e-9, max_cycle=60)
    assert convl
    mo = d["mo_coeff"]
    h_mo = jnp.asarray(mo.T @ d["hcore"] @ mo)
    eri_mo = ao2mo.full(jnp.asarray(d["eri_ao"]), jnp.asarray(mo))
    rdm1, rdm2 = lambda_ad.make_rdm12(h_mo, eri_mo, t1, t2, l1, l2, 5)
    assert abs(float(jnp.trace(rdm1)) - 10.0) < 1e-9
    e_from_rdm = float(jnp.einsum("pq,pq->", h_mo, rdm1)
                       + 0.5 * jnp.einsum("pqrs,pqrs->", eri_mo, rdm2)) \
        + float(d["e_nuc"])
    e_expect = float(d["e_tot"]) + e_corr
    assert abs(e_from_rdm - e_expect) < 1e-9
    # physical natural occupations
    w = np.linalg.eigvalsh(np.asarray(rdm1))
    assert w.min() > -1e-8
    assert w.max() < 2.0 + 1e-8


def test_residual_zero_at_solution():
    d, er, e_corr, t1, t2 = _solve()
    r1, r2 = lambda_ad.residual(t1, t2, er)
    assert float(jnp.abs(r1).max()) < 1e-8
    assert float(jnp.abs(r2).max()) < 1e-8


def test_lambda_device_diis_matches_host():
    _, er, _, t1, t2 = _solve()
    ch, l1h, l2h = lambda_ad.kernel(t1, t2, er, conv_tol=1e-9, max_cycle=60,
                                    diis_backend="host")
    cd, l1d, l2d = lambda_ad.kernel(t1, t2, er, conv_tol=1e-9, max_cycle=60,
                                    diis_backend="device")
    assert ch and cd
    # both converge to the same stationary multipliers
    assert float(jnp.abs(l1h - l1d).max()) < 1e-8
    assert float(jnp.abs(l2h - l2d).max()) < 1e-8
    # bf16 error ring (quarter-smaller HBM ring; lib/device_diis.init):
    # error vectors only feed the Gram matrix, so convergence must reach
    # the same stationary point (possibly along a different path)
    cb, l1b, l2b = lambda_ad.kernel(t1, t2, er, conv_tol=1e-9, max_cycle=80,
                                    diis_backend="device",
                                    diis_err_dtype=jnp.bfloat16)
    assert cb
    assert float(jnp.abs(l1h - l1b).max()) < 1e-7
    assert float(jnp.abs(l2h - l2b).max()) < 1e-7
