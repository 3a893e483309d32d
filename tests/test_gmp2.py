"""GMP2: spin-orbital MP2 energies, non-canonical iteration, RDMs."""

import numpy as np
import jax.numpy as jnp

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import gccsd_slow
from pyscf_mpcc_tpu.mp import gmp2
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

E_MP2 = -0.2040199672883385   # pyscf/cc/test/test_h2o.py:60


def _h2o_mf():
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    return mf


def _so_eris_from_fixture(d, nocc=5):
    mo = d["mo_coeff"]
    f = d["fock_ao"]
    return gccsd_slow.build_eris(d["eri_ao"], mo, mo, (f, f),
                                 (nocc, nocc))


def test_gmp2_matches_restricted_pinned_value():
    d = h2o_ccpvdz()
    er = _so_eris_from_fixture(d)
    e, t2 = gmp2.kernel(er)
    assert abs(e - E_MP2) < 1e-9


def test_gmp2_noncanonical_iteration_matches_canonical():
    mf = _h2o_mf()
    er = gccsd_slow.eris_from_scf(mf)
    e0, _ = gmp2.kernel(er)
    e_it, _ = gmp2.kernel_iterative(er, tol=1e-12)
    assert abs(e_it - e0) < 1e-9


def test_gmp2_rdm_energy_identity():
    """E_elec = sum h*gamma + 1/4 sum <pq||rs> Gamma must equal
    E_HF_elec + E_MP2 for the unrelaxed response densities."""
    mf = _h2o_mf()
    er = gccsd_slow.eris_from_scf(mf)
    m = gmp2.GMP2(mf).run()
    no, nso = er.nocc, er.nso
    ints = np.asarray(er.ints)
    fock = np.asarray(er.fock)
    # recover the one-electron hamiltonian in the spin-orbital MO basis:
    # h = f - sum_i <p i||q i>
    h = fock - np.einsum("piqi->pq", ints[:, :no, :, :no])
    g1 = np.asarray(m.make_rdm1())
    g2 = np.asarray(m.make_rdm2())
    e_rdm = np.einsum("pq,pq->", h, g1) + 0.25 * np.einsum(
        "pqrs,pqrs->", ints, g2)
    e_hf_elec = mf.e_tot - mf.mol.energy_nuc()
    assert abs(e_rdm - (e_hf_elec + m.e_corr)) < 1e-8


def test_gmp2_rdm1_matches_restricted_spin_sum():
    from pyscf_mpcc_tpu import ao2mo
    from pyscf_mpcc_tpu.mp import mp2
    d = h2o_ccpvdz()
    nocc = 5
    co = d["mo_coeff"][:, :nocc]
    cv = d["mo_coeff"][:, nocc:]
    ovov = ao2mo.general(jnp.asarray(d["eri_ao"]), (co, cv, co, cv))
    _, t2r = mp2.kernel(jnp.asarray(d["mo_energy"][:nocc]),
                        jnp.asarray(d["mo_energy"][nocc:]), ovov)
    rdm1_r = np.asarray(mp2.make_rdm1(t2r, nocc))

    er = _so_eris_from_fixture(d, nocc)
    _, t2g = gmp2.kernel(er)
    g1 = np.asarray(gmp2.make_rdm1(t2g, er.nocc, er.nso))
    # spin-sum back to spatial orbitals; build_eris orders spin orbitals
    # [occ_a, occ_b, vir_a, vir_b]
    nmo = d["mo_coeff"].shape[1]
    spat = np.concatenate([np.arange(nocc), np.arange(nocc),
                           np.arange(nocc, nmo), np.arange(nocc, nmo)])
    spins = np.asarray(er.spins)
    g1_spatial = np.zeros((nmo, nmo))
    for p in range(er.nso):
        for q in range(er.nso):
            if spins[p] == spins[q]:
                g1_spatial[spat[p], spat[q]] += g1[p, q]
    np.testing.assert_allclose(g1_spatial, rdm1_r, atol=1e-8)
