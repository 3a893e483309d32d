"""Geometry scanners: SCF and CCSD warm-started PES evaluation.

Reference counterparts: scf/hf.py as_scanner (SCF_Scanner) and
cc/ccsd.py:883 (CCSD_Scanner) — call with a new geometry, reuse the
previous density / amplitudes as the starting guess."""

import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import CCSD
from pyscf_mpcc_tpu.scf import RHF

GEOM1 = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"
GEOM2 = "O 0 0 0.1273; H 0 0.7672 -0.4692; H 0 -0.7672 -0.4692"


def _fresh(geom):
    mol = gto.M(atom=geom, basis="cc-pvdz", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-11
    mf.kernel()
    cc = CCSD(mf, frozen=1)
    cc.conv_tol = 1e-9
    cc.kernel()
    return mf, cc


def test_scf_scanner_matches_fresh_runs():
    mf1, _ = _fresh(GEOM1)
    scan = mf1.as_scanner()
    e2 = scan(GEOM2)
    mf2_fresh = RHF(gto.M(atom=GEOM2, basis="cc-pvdz", unit="angstrom"))
    mf2_fresh.conv_tol = 1e-11
    e2_fresh = mf2_fresh.kernel()
    assert scan.converged
    np.testing.assert_allclose(e2, e2_fresh, atol=1e-9)
    # scanner accepts a pre-built Mole too and returns to geometry 1
    e1 = scan(gto.M(atom=GEOM1, basis="cc-pvdz", unit="angstrom"))
    np.testing.assert_allclose(e1, mf1.e_tot, atol=1e-9)


def test_ccsd_scanner_warm_start_matches_fresh():
    _, cc1 = _fresh(GEOM1)
    scan = cc1.as_scanner()
    e2 = scan(GEOM2)
    _, cc2_fresh = _fresh(GEOM2)
    assert scan.converged
    np.testing.assert_allclose(e2, cc2_fresh.e_tot, atol=1e-8)
    # warm start must actually be warm: seeded with converged t1/t2 of an
    # adjacent geometry the solve finishes in fewer cycles than a cold
    # MP2-guess solve of the same geometry (checked indirectly: a 1-cycle
    # budget already lands within 1e-4 of the converged answer)
    cc_probe = CCSD(scan._mf_scan.mf, frozen=1)
    cc_probe.max_cycle = 1
    cc_probe.kernel(t1=scan.cc.t1, t2=scan.cc.t2)
    assert abs(cc_probe.e_corr - scan.cc.e_corr) < 1e-6
