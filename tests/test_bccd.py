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


def test_bccd_t_close_to_ccsd_t():
    """BCCD(T) total correlation should track CCSD(T) closely for a
    single-reference molecule (Brueckner and HF orbitals nearly agree)."""
    import numpy as np
    from pyscf_mpcc_tpu.cc import bccd, ccsd_t, rccsd
    from pyscf_mpcc_tpu.cc import eris as eris_mod
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF

    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    eri_ao = gto.intor_eri(mol)
    e_b, e_bt, mo = bccd.kernel_t(mf, eri_ao, t1_tol=1e-7)
    assert e_bt < 0

    er = eris_mod.make_eris_incore(eri_ao, mf.mo_coeff,
                                   mf.get_fock(mf.make_rdm1()),
                                   mol.nelectron // 2)
    conv, e_c, t1, t2 = rccsd.kernel(er, conv_tol=1e-11,
                                     conv_tol_normt=1e-9)
    e_ct = ccsd_t.kernel(t1, t2, er, tile=8)
    assert abs((e_b + e_bt) - (e_c + e_ct)) < 2e-4
