"""Triplet EE-EOM (restricted) and G-spin EOM (EE/IP/EA over the
spin-orbital Jacobian).

Cross-validation web (no external data needed):
  - kernel_ee_triplet (sigma-antisymmetric sector of the UCCSD Jacobian)
    must agree with the lowest roots of the spin-blocked kernel_ee_u,
    which covers both manifolds — and must NOT contain the singlet roots.
  - kernel_ee_g (Delta-Ms = 0, spin-orbital) sees the union of both
    manifolds; its lowest root must match the triplet.
  - kernel_ip_g / kernel_ea_g must reproduce the fast restricted
    embedding solvers at a closed-shell reference.
Reference counterparts: pyscf/cc/eom_rccsd.py:977 (EOMEETriplet),
eom_gccsd.py (EOMEE/EOMIP/EOMEA).
"""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import eom, eris as eris_mod, gccsd_slow, rccsd, uccsd
from pyscf_mpcc_tpu.scf import RHF


@pytest.fixture(scope="module")
def h2o():
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    eri_ao = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    nocc = mol.nelectron // 2
    er = eris_mod.make_eris_incore(eri_ao, mf.mo_coeff, f, nocc)
    conv, _, t1, t2 = rccsd.kernel(er, conv_tol=1e-11, conv_tol_normt=1e-9,
                                   max_cycle=100)
    assert conv
    ue = uccsd.make_eris_incore(eri_ao, mf.mo_coeff, mf.mo_coeff, f, f,
                                nocc, nocc)
    return dict(mf=mf, er=er, ue=ue, t1=t1, t2=t2)


def test_triplet_matches_spin_blocked_u(h2o):
    """The restricted triplet solver must reproduce the triplet roots the
    spin-blocked U solver finds (its lowest roots at this geometry)."""
    t1, t2, ue = h2o["t1"], h2o["t2"], h2o["ue"]
    conv_t, e_t, _ = eom.kernel_ee_triplet(t1, t2, ue, nroots=2, tol=1e-8)
    t1u, t2u = eom.embed_restricted(t1, t2)
    conv_u, e_u, _ = eom.kernel_ee_u(t1u, t2u, ue, nroots=3, tol=1e-8)
    assert conv_t[0] and conv_u[0]
    # lowest EE root of H2O is the triplet; pinned agreement at 1e-7
    assert abs(e_t[0] - e_u[0]) < 1e-7
    # and the second triplet appears among the U roots
    assert min(abs(e_t[1] - np.asarray(e_u))) < 1e-7


def test_triplet_disjoint_from_singlet(h2o):
    t1, t2, er, ue = h2o["t1"], h2o["t2"], h2o["er"], h2o["ue"]
    conv_s, e_s, _ = eom.kernel_ee(t1, t2, er, nroots=1, tol=1e-8)
    conv_t, e_t, _ = eom.kernel_ee_triplet(t1, t2, ue, nroots=1, tol=1e-8)
    assert conv_s[0] and conv_t[0]
    # manifolds must differ (triplet below singlet for H2O)
    assert e_t[0] < e_s[0] - 1e-3


def test_ee_g_sees_both_manifolds(h2o):
    """Delta-Ms = 0 G-spin EE: lowest root == triplet, and the singlet
    root appears in the spectrum."""
    mf = h2o["mf"]
    so = gccsd_slow.eris_from_scf(mf)
    _, t1g, t2g, _ = gccsd_slow.kernel(so, conv_tol=1e-11,
                                       conv_tol_normt=1e-9)
    conv_g, e_g, _ = eom.kernel_ee_g(t1g, t2g, so, nroots=4, delta_ms=0,
                                     tol=1e-7)
    conv_t, e_t, _ = eom.kernel_ee_triplet(h2o["t1"], h2o["t2"], h2o["ue"],
                                           nroots=1, tol=1e-8)
    assert conv_g[0] and conv_t[0]
    assert abs(e_g[0] - e_t[0]) < 1e-6
    conv_s, e_s, _ = eom.kernel_ee(h2o["t1"], h2o["t2"], h2o["er"],
                                   nroots=1, tol=1e-8)
    assert min(abs(np.asarray(e_g) - e_s[0])) < 1e-6


def test_ip_ea_g_match_restricted(h2o):
    mf = h2o["mf"]
    so = gccsd_slow.eris_from_scf(mf)
    _, t1g, t2g, _ = gccsd_slow.kernel(so, conv_tol=1e-11,
                                       conv_tol_normt=1e-9)
    cg, e_ipg, _ = eom.kernel_ip_g(t1g, t2g, so, nroots=2, tol=1e-7)
    cr, e_ipr, _ = eom.kernel_ip(h2o["t1"], h2o["t2"], h2o["er"],
                                 nroots=1, tol=1e-8)
    assert cg[0] and cr[0]
    assert abs(e_ipg[0] - e_ipr[0]) < 1e-6

    cg, e_eag, _ = eom.kernel_ea_g(t1g, t2g, so, nroots=2, tol=1e-7)
    cr, e_ear, _ = eom.kernel_ea(h2o["t1"], h2o["t2"], h2o["er"],
                                 nroots=1, tol=1e-8)
    assert cg[0] and cr[0]
    assert abs(e_eag[0] - e_ear[0]) < 1e-6


def test_triplet_exact_for_two_electrons():
    """For H2 the EOM-CCSD triplet gaps are exact eigenvalue gaps of the
    determinant-space Hamiltonian (CCSD == FCI at 2 electrons)."""
    from pyscf_mpcc_tpu.cc import eom_slow
    from pyscf_mpcc_tpu.ci.fci_slow import FCI
    mol = gto.M(atom="H 0 0 0; H 0 0 0.74", basis="6-31g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.kernel()
    eri_ao = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    er = eris_mod.make_eris_incore(eri_ao, mf.mo_coeff, f, 1)
    conv, _, t1, t2 = rccsd.kernel(er, conv_tol=1e-12,
                                   conv_tol_normt=1e-11, max_cycle=100)
    assert conv
    ue = uccsd.make_eris_incore(eri_ao, mf.mo_coeff, mf.mo_coeff, f, f, 1, 1)
    conv_t, e_t, _ = eom.kernel_ee_triplet(t1, t2, ue, nroots=2, tol=1e-9)
    so = gccsd_slow.eris_from_scf(mf)
    h_so = eom_slow.h_so_from_eris(so)
    fci = FCI(h_so, so.ints, 2, so.nso)
    w, _ = fci.kernel(nroots=20)
    gaps = np.unique(np.round(w[1:] - w[0], 10))
    for k in range(2):
        assert conv_t[k]
        assert np.min(np.abs(gaps - e_t[k])) < 1e-7
