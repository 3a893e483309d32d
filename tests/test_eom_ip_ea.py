"""IP/EA-EOM-CCSD (similarity-transform implementation) tests.

Rigorous oracle: for a two-electron reference, CCSD is FCI and the
{1h, 2h1p} space spans the complete (N-1)-electron space, so the IP roots
must equal exact cation energies minus the exact ground-state energy."""

import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import eom_slow, gccsd_slow
from pyscf_mpcc_tpu.ci.fci_slow import FCI
from pyscf_mpcc_tpu.scf import RHF


def _setup():
    mol = gto.M(atom="H 0 0 0; H 0 0 0.74", basis="6-31g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    e, t1, t2, conv = gccsd_slow.kernel(so, conv_tol=1e-12,
                                        conv_tol_normt=1e-11, max_cycle=100)
    assert conv
    h_so = eom_slow.h_so_from_eris(so)
    e_cc_elec = float(mf.e_tot - mol.energy_nuc() + e)
    return mol, mf, so, h_so, t1, t2, e_cc_elec


def test_ip_exact_for_two_electrons():
    mol, mf, so, h_so, t1, t2, e_cc = _setup()
    ips = eom_slow.ipccsd(h_so, so.ints, t1, t2, so.nocc, so.nso,
                          nroots=3, e_ccsd_tot=e_cc)
    # exact cation (1-electron) energies: eigenvalues of h_so
    w1 = np.sort(np.linalg.eigvalsh(h_so))
    exact_ips = w1[:3] - e_cc
    assert np.abs(ips - exact_ips).max() < 1e-8
    # the first IP of H2 is positive and ~0.6 Ha region
    assert 0.3 < ips[0] < 1.2


def test_ea_sane_for_two_electrons():
    mol, mf, so, h_so, t1, t2, e_cc = _setup()
    eas = eom_slow.eaccsd(h_so, so.ints, t1, t2, so.nocc, so.nso,
                          nroots=2, e_ccsd_tot=e_cc)
    # H2 anion is unbound in this basis: attachment energies positive,
    # bounded by the virtual orbital energies scale
    assert eas[0] > 0.0
    assert eas[0] < 1.0


def _h2o_setup():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    e, t1, t2, conv = gccsd_slow.kernel(so, conv_tol=1e-12,
                                        conv_tol_normt=1e-11, max_cycle=150)
    assert conv
    h_so = eom_slow.h_so_from_eris(so)
    e_cc_elec = float(mf.e_tot - mol.energy_nuc() + e)
    return mol, mf, so, h_so, t1, t2, e_cc_elec


def test_fast_ip_ea_match_oracle_h2o():
    """The continuum-orbital IP/EA sigma (jvp of the augmented EE Jacobian)
    must reproduce the exact-diagonalization Hbar projection."""
    import jax.numpy as jnp
    from pyscf_mpcc_tpu.cc import eom, rccsd
    from pyscf_mpcc_tpu.cc import eris as eris_mod

    mol, mf, so, h_so, T1, T2, e_cc = _h2o_setup()
    ips_ref = eom_slow.ipccsd(h_so, so.ints, T1, T2, so.nocc, so.nso,
                              nroots=6, e_ccsd_tot=e_cc)
    eas_ref = eom_slow.eaccsd(h_so, so.ints, T1, T2, so.nocc, so.nso,
                              nroots=4, e_ccsd_tot=e_cc)
    eri = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    er = eris_mod.make_eris_incore(eri, mf.mo_coeff, f, 5)
    conv, _, t1, t2 = rccsd.kernel(er, conv_tol=1e-12, conv_tol_normt=1e-10)
    assert conv
    cv, ips, _ = eom.kernel_ip(t1, t2, er, nroots=3, tol=1e-9)
    cve, eas, _ = eom.kernel_ea(t1, t2, er, nroots=2, tol=1e-9)
    assert all(cv) and all(cve)
    uref_ip = np.unique(np.round(ips_ref, 10))[:3]
    uref_ea = np.unique(np.round(eas_ref, 10))[:2]
    assert np.abs(ips - uref_ip).max() < 1e-8
    assert np.abs(eas - uref_ea).max() < 1e-8


def test_ip_ea_ee_reference_pinned_h2o_ccpvdz():
    """Reference-pinned parity: the reference fork's own eom_rccsd
    (ipccsd :291, eaccsd :606, eeccsd singlet :977) run on this host
    with identical injected integrals (tools/pin_reference_values.py
    'h2o', 2026-08-19) -- production-scale basis, exact values."""
    import jax.numpy as jnp  # noqa: F401
    from pyscf_mpcc_tpu.cc import eom, rccsd
    from pyscf_mpcc_tpu.cc import eris as eris_mod

    REF_E_CORR = -0.2133274273544366
    REF_IP = [0.433564372260947, 0.5186599930972678, 0.6784704515875678]
    REF_EA = [0.16741950216613447, 0.24029462761583625, 0.5101075032617646]
    REF_EE = [0.3006258759956825, 0.37594403988325975, 0.397748269999603]

    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="cc-pvdz", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.kernel()
    eri = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    er = eris_mod.make_eris_incore(eri, mf.mo_coeff, f, mol.nelectron // 2)
    conv, e_corr, t1, t2 = rccsd.kernel(er, conv_tol=1e-11,
                                        conv_tol_normt=1e-9, max_cycle=100)
    assert conv
    assert abs(float(e_corr) - REF_E_CORR) < 1e-8

    _, ips, _ = eom.kernel_ip(t1, t2, er, nroots=3, tol=1e-9)
    _, eas, _ = eom.kernel_ea(t1, t2, er, nroots=3, tol=1e-9)
    _, ees, _ = eom.kernel_ee(t1, t2, er, nroots=3, tol=1e-9)
    assert np.abs(np.asarray(ips) - REF_IP).max() < 1e-7
    assert np.abs(np.asarray(eas) - REF_EA).max() < 1e-7
    # EE runs both Davidsons (ours and the reference's) at finite
    # residual tolerance; the 3rd root agrees to ~1.2e-7 Ha (3e-6 eV)
    assert np.abs(np.asarray(ees) - REF_EE).max() < 5e-7


def test_fast_ip_ea_unrestricted_match_oracle():
    """Unrestricted IP/EA on an open-shell radical vs the exact oracle,
    per Sz sector (Hbar is Sz-block-diagonal; the oracle's unfiltered
    spectrum also contains spin-flip sectors no 1h-removal ansatz spans)."""
    from pyscf_mpcc_tpu.cc import eom, uccsd
    from pyscf_mpcc_tpu.scf import UHF

    mol = gto.M(atom="O 0 0 0; H 0 0 0.97", basis="sto-3g", spin=1)
    mf = UHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    e, T1, T2, conv = gccsd_slow.kernel(so, conv_tol=1e-12,
                                        conv_tol_normt=1e-11, max_cycle=200)
    assert conv
    h_so = eom_slow.h_so_from_eris(so)
    e_cc = float(mf.e_tot - mol.energy_nuc() + e)
    na, nb = mol.nelec

    ue = uccsd.eris_from_scf(mf)
    cu, _, t1, t2 = uccsd.kernel(ue, conv_tol=1e-12, conv_tol_normt=1e-10,
                                 max_cycle=200)
    assert cu

    for spin, nalpha_ip, nalpha_ea in (("a", na - 1, na + 1),
                                       ("b", na, na)):
        ips_ref = eom_slow.ipccsd(h_so, so.ints, T1, T2, so.nocc, so.nso,
                                  nroots=2, e_ccsd_tot=e_cc,
                                  nalpha=nalpha_ip, spins=so.spins)
        eas_ref = eom_slow.eaccsd(h_so, so.ints, T1, T2, so.nocc, so.nso,
                                  nroots=2, e_ccsd_tot=e_cc,
                                  nalpha=nalpha_ea, spins=so.spins)
        _, ips, _ = eom.kernel_ip_u(t1, t2, ue, nroots=2, tol=1e-9,
                                    spin=spin)
        _, eas, _ = eom.kernel_ea_u(t1, t2, ue, nroots=2, tol=1e-9,
                                    spin=spin)
        assert np.abs(ips - ips_ref[:2]).max() < 1e-8, (spin, ips, ips_ref)
        assert np.abs(eas - eas_ref[:2]).max() < 1e-8, (spin, eas, eas_ref)
