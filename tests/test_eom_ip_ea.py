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
