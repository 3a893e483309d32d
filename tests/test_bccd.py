import numpy as np

from pyscf_mpcc_tpu.cc import bccd
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz, mol_of

E_CCSD = -0.2133432312951


def test_bccd_converges_near_ccsd():
    d = h2o_ccpvdz()
    mol = mol_of()
    mf = RHF(mol)
    mf.mo_coeff = d["mo_coeff"]
    mf.mo_energy = d["mo_energy"]
    mf.mo_occ = d["mo_occ"]
    mf.converged = True
    mf.e_tot = float(d["e_tot"])
    e_bccd, mo_b, t2, nmac = bccd.kernel(mf, d["eri_ao"], max_macro=30)
    assert nmac <= 15
    # Brueckner orbitals stay S-orthonormal
    ov = mo_b.T @ mf.S @ mo_b
    assert np.abs(ov - np.eye(ov.shape[0])).max() < 1e-8
    # BCCD is close to (but distinct from) CCSD
    assert abs(e_bccd - E_CCSD) < 1e-3
    assert abs(e_bccd - E_CCSD) > 1e-6
