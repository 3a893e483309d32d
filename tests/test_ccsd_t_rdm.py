"""Lambda-CCSD(T) + (T) response density matrices (cc/ccsd_t_rdm.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyscf_mpcc_tpu import ao2mo, gto
from pyscf_mpcc_tpu.cc import ccsd_t, ccsd_t_rdm, lambda_ad, rccsd
from pyscf_mpcc_tpu.cc import eris as eris_mod
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

# reference pinned value, pyscf/cc/ccsd_t.py:255
E_T_PINNED = -0.0033300722704016


def test_dense_t_energy_matches_pinned_and_tiled():
    d = h2o_ccpvdz(geom="tilt")   # the reference's distorted geometry
    er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                   d["fock_ao"], 5)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-12, conv_tol_normt=1e-10,
                                   max_cycle=200)
    e_dense = float(ccsd_t_rdm.e_t_dense(t1, t2, er))
    assert abs(e_dense - E_T_PINNED) < 1e-9
    e_tiled = ccsd_t.kernel(t1, t2, er, tile=8)
    assert abs(e_dense - e_tiled) < 1e-11


@pytest.fixture(scope="module")
def h2o_sto3g():
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    nocc = mol.nelectron // 2
    mo = np.asarray(mf.mo_coeff)
    h_mo = jnp.asarray(mo.T @ mf.get_hcore() @ mo)
    eri_mo = ao2mo.full(jnp.asarray(gto.intor_eri(mol)), jnp.asarray(mo))
    return mf, nocc, h_mo, eri_mo


def _solve(h_mo, eri_mo, nocc):
    """CCSD(T) from MO integrals alone (fixed orbitals)."""
    nmo = h_mo.shape[0]
    dm = jnp.zeros((nmo, nmo)).at[jnp.arange(nocc),
                                  jnp.arange(nocc)].set(2.0)
    j = jnp.einsum("pqrs,rs->pq", eri_mo, dm)
    k = jnp.einsum("prqs,rs->pq", eri_mo, dm)
    fock = h_mo + j - 0.5 * k
    o, v = slice(0, nocc), slice(nocc, nmo)
    er = eris_mod.RERIs(
        fock=fock, mo_energy=jnp.diagonal(fock),
        oooo=eri_mo[o, o, o, o], ovoo=eri_mo[o, v, o, o],
        ovov=eri_mo[o, v, o, v], oovv=eri_mo[o, o, v, v],
        ovvo=eri_mo[o, v, v, o], ovvv=eri_mo[o, v, v, v],
        vvvv=eri_mo[v, v, v, v])
    e_hf = float(jnp.sum(dm * h_mo)
                 + 0.5 * jnp.sum(dm * (j - 0.5 * k)))
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-12,
                                   conv_tol_normt=1e-10)
    assert conv
    et = float(ccsd_t_rdm.e_t_dense(t1, t2, er))
    return er, e_hf + e + et, t1, t2


def test_rdm_energy_identity_and_trace(h2o_sto3g):
    mf, nocc, h_mo, eri_mo = h2o_sto3g
    er, e_tot, t1, t2 = _solve(h_mo, eri_mo, nocc)
    conv, l1, l2 = ccsd_t_rdm.lambda_kernel(t1, t2, er, conv_tol=1e-10)
    assert conv
    g1, g2 = ccsd_t_rdm.make_rdm12(h_mo, eri_mo, t1, t2, l1, l2, nocc)
    assert abs(float(jnp.trace(g1)) - mf.mol.nelectron) < 1e-8
    e_rdm = float(jnp.sum(g1 * h_mo)
                  + 0.5 * jnp.einsum("pqrs,pqrs->", eri_mo, g2))
    assert abs(e_rdm - e_tot) < 1e-9


def test_rdm1_matches_finite_field(h2o_sto3g):
    """Tr(gamma1 V) must equal the derivative of the FULLY re-solved
    CCSD(T) energy under h -> h + x V (fixed orbitals): validates the
    (T) contribution to the Lambda equations."""
    mf, nocc, h_mo, eri_mo = h2o_sto3g
    rng = np.random.default_rng(5)
    nmo = h_mo.shape[0]
    V = rng.standard_normal((nmo, nmo)) * 0.01
    V = jnp.asarray(V + V.T)

    x = 3e-4
    _, ep, _, _ = _solve(h_mo + x * V, eri_mo, nocc)
    _, em, _, _ = _solve(h_mo - x * V, eri_mo, nocc)
    de_fd = (ep - em) / (2 * x)

    er, _, t1, t2 = _solve(h_mo, eri_mo, nocc)
    conv, l1, l2 = ccsd_t_rdm.lambda_kernel(t1, t2, er, conv_tol=1e-10)
    g1, _ = ccsd_t_rdm.make_rdm12(h_mo, eri_mo, t1, t2, l1, l2, nocc)
    de_an = float(jnp.sum(g1 * V))
    assert abs(de_an - de_fd) < 5e-7

    # the plain CCSD Lambda misses the (T) response: it must NOT pass
    convc, l1c, l2c = lambda_ad.kernel(t1, t2, er, conv_tol=1e-10)
    g1c, _ = lambda_ad.make_rdm12(h_mo, eri_mo, t1, t2, l1c, l2c, nocc)
    de_ccsd_dm = float(jnp.sum(g1c * V))
    assert abs(de_ccsd_dm - de_fd) > 5 * abs(de_an - de_fd)
