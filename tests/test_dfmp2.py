"""Native DF-MP2: energies, unrelaxed/relaxed densities, natural orbitals.

The relaxed-density machinery (AD Hylleraas orbital gradient + HVP-CG
Z-vector + Lagrangian derivative) is validated against the gold standard:
the analytic first-order response Tr(gamma_rel V) must match the finite
difference of the *fully relaxed* SCF+MP2 total energy under a
one-electron perturbation h -> h + x V.  The unrelaxed density fails
this test by construction; the relaxed one must pass."""

import numpy as np
import jax.numpy as jnp

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.mp.dfmp2 import DFRMP2, SCSDFRMP2
from pyscf_mpcc_tpu.scf import RHF


def _mol():
    return gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                      "H 0 -0.7572 -0.4692",
                 basis="sto-3g", unit="angstrom")


def _mf(mol, dh=None):
    mf = RHF(mol).density_fit()
    if dh is not None:
        mf.hcore = mf.hcore + dh
    mf.conv_tol = 1e-13
    mf.kernel()
    return mf


def test_dfmp2_energy_matches_df_kernel():
    mol = _mol()
    mf = _mf(mol)
    m = DFRMP2(mf).run()
    # cross-check against the eris-path DF-MP2
    from pyscf_mpcc_tpu.mp import mp2
    C = m.mo_coeff
    no = m.nocc
    Lov = jnp.einsum("Lpq,pi,qa->Lia", jnp.asarray(mf.with_df.B_ao()),
                     jnp.asarray(C[:, :no]), jnp.asarray(C[:, no:]))
    e_ref, _ = mp2.df_kernel(jnp.asarray(m.mo_energy[:no]),
                             jnp.asarray(m.mo_energy[no:]), Lov)
    assert abs(m.e_corr - float(e_ref)) < 1e-12


def test_relaxed_rdm1_matches_finite_difference():
    mol = _mol()
    rng = np.random.default_rng(7)
    nao = _mf(mol).mo_coeff.shape[0]
    V = rng.standard_normal((nao, nao)) * 0.01
    V = V + V.T

    def e_tot(x):
        mf = _mf(_mol(), dh=x * V)
        return DFRMP2(mf).run().e_tot

    x = 2e-4
    de_fd = (e_tot(x) - e_tot(-x)) / (2 * x)

    mf0 = _mf(_mol())
    m = DFRMP2(mf0).run()
    g_rel = m.make_rdm1(relaxed=True, ao_repr=True)
    de_an = float(np.sum(g_rel * V))
    assert abs(de_an - de_fd) < 5e-7

    # the unrelaxed density must NOT reproduce the relaxed response
    g_unrel = m.make_rdm1(relaxed=False, ao_repr=True)
    de_unrel = float(np.sum(g_unrel * V))
    assert abs(de_unrel - de_fd) > 10 * abs(de_an - de_fd)


def test_scs_relaxed_rdm1_finite_difference():
    mol = _mol()
    rng = np.random.default_rng(3)
    nao = _mf(mol).mo_coeff.shape[0]
    V = rng.standard_normal((nao, nao)) * 0.01
    V = V + V.T

    def e_tot(x):
        mf = _mf(_mol(), dh=x * V)
        return SCSDFRMP2(mf).run().e_tot

    x = 2e-4
    de_fd = (e_tot(x) - e_tot(-x)) / (2 * x)
    m = SCSDFRMP2(_mf(_mol())).run()
    g_rel = m.make_rdm1(relaxed=True, ao_repr=True)
    assert abs(float(np.sum(g_rel * V)) - de_fd) < 5e-7


def test_frozen_core_relaxed_rdm1_finite_difference():
    # reference dfmp2_native.py:146-181 supports frozen-core relaxed
    # densities; ours solves the constrained Lagrangian with the extra
    # frozen-active canonicality multipliers (GMRES on the constraint
    # vjp).  Gold standard: analytic response == finite difference of
    # the fully-relaxed frozen-core SCF+MP2 total energy.
    mol = _mol()
    rng = np.random.default_rng(11)
    nao = _mf(mol).mo_coeff.shape[0]
    V = rng.standard_normal((nao, nao)) * 0.01
    V = V + V.T

    def e_tot(x):
        mf = _mf(_mol(), dh=x * V)
        return DFRMP2(mf, frozen=1).run().e_tot

    x = 2e-4
    de_fd = (e_tot(x) - e_tot(-x)) / (2 * x)

    m = DFRMP2(_mf(_mol()), frozen=1).run()
    g_rel = m.make_rdm1(relaxed=True, ao_repr=True)
    de_an = float(np.sum(g_rel * V))
    assert abs(de_an - de_fd) < 5e-7

    # without the frozen-active multipliers the response is wrong:
    # the unrelaxed density misses it by far more
    g_unrel = m.make_rdm1(relaxed=False, ao_repr=True)
    # unrelaxed misses the HF part entirely (correlation-only), so
    # compare against the relaxed error scale
    assert abs(float(np.sum(g_unrel * V)) - de_fd) > 10 * abs(de_an - de_fd)


def test_natorbs_trace_and_order():
    mol = _mol()
    m = DFRMP2(_mf(mol)).run()
    occ, nat = m.make_natorbs()
    assert abs(occ.sum() - mol.nelectron) < 1e-8
    assert np.all(np.diff(occ) <= 1e-12)       # descending
    # natural orbitals stay S-orthonormal
    S = np.asarray(m._scf.get_ovlp())
    np.testing.assert_allclose(nat.T @ S @ nat, np.eye(nat.shape[1]),
                               atol=1e-8)
