import numpy as np

from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

# Reference pinned value: pyscf/scf/test/test_rhf.py:372
E_RHF_H2O_CCPVDZ = -76.026765673119627


def test_rhf_h2o_ccpvdz():
    d = h2o_ccpvdz()
    assert abs(float(d["e_tot"]) - E_RHF_H2O_CCPVDZ) < 1e-9


def test_uhf_matches_rhf_closed_shell():
    from pyscf_mpcc_tpu.testutil import mol_of
    from pyscf_mpcc_tpu.scf import UHF
    mol = mol_of(basis="sto-3g")
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    e = mf.kernel()
    from pyscf_mpcc_tpu.scf import RHF
    mf2 = RHF(mol)
    mf2.conv_tol = 1e-12
    e2 = mf2.kernel()
    assert abs(e - e2) < 1e-8


def test_rohf_triplet_o2_runs():
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import ROHF, UHF
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = ROHF(mol)
    mf.conv_tol = 1e-10
    e_ro = mf.kernel()
    assert mf.converged
    mfu = UHF(mol)
    mfu.conv_tol = 1e-10
    e_u = mfu.kernel()
    assert mfu.converged
    # UHF is variationally below (or equal to) ROHF
    assert e_u <= e_ro + 1e-9
