"""Facade API tests, including the reference's frozen-core pinned value."""

import numpy as np

from pyscf_mpcc_tpu.cc import CCSD
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz, mol_of

# pyscf/cc/test/test_h2o.py:79-84
E_CCSD_FROZEN1 = -0.21124878189922872
E_CCSD = -0.2133432312951


def _mf():
    d = h2o_ccpvdz()
    mol = mol_of()
    mf = RHF(mol)
    mf.mo_coeff = d["mo_coeff"]
    mf.mo_energy = d["mo_energy"]
    mf.mo_occ = d["mo_occ"]
    mf.converged = True
    mf.e_tot = float(d["e_tot"])
    mf._jk = None
    # reuse the cached AO eri for speed
    return mol, mf, d


def test_ccsd_facade():
    mol, mf, d = _mf()
    cc = CCSD(mf)
    cc._eri_ao = d["eri_ao"]
    cc.conv_tol = 1e-10
    cc.conv_tol_normt = 1e-8
    e, t1, t2 = cc.kernel()
    assert cc.converged
    assert abs(e - E_CCSD) < 1e-7
    assert abs(cc.e_tot - (float(d["e_tot"]) + e)) < 1e-12


def test_ccsd_frozen_core_pinned():
    mol, mf, d = _mf()
    cc = CCSD(mf, frozen=1)
    cc._eri_ao = d["eri_ao"]
    cc.conv_tol = 1e-10
    cc.conv_tol_normt = 1e-8
    e, t1, t2 = cc.kernel()
    assert cc.converged
    assert abs(e - E_CCSD_FROZEN1) < 1e-7


def test_chk_warm_restart(tmp_path):
    import os
    mol, mf, d = _mf()
    cc = CCSD(mf)
    cc._eri_ao = d["eri_ao"]
    cc.conv_tol = 1e-10
    cc.conv_tol_normt = 1e-8
    cc.kernel()
    p = os.path.join(tmp_path, "cc.chk")
    cc.dump_chk(p)
    cc2 = CCSD(mf)
    cc2._eri_ao = d["eri_ao"]
    cc2.conv_tol = 1e-10
    cc2.conv_tol_normt = 1e-8
    cc2.restore_from_chk(p)
    # warm start converges immediately (few cycles)
    e, t1, t2 = cc2.kernel(t1=cc2.t1, t2=cc2.t2)
    assert abs(e - cc.e_corr) < 1e-9


def test_uccsd_t_frozen_matches_rccsd_t():
    """Frozen-core UCCSD(T) through the driver (previously crashed on a
    shape mismatch: full-space spin-orbital eris vs frozen-reduced
    amplitudes).  Closed shell: must equal the RCCSD(T) correction."""
    from pyscf_mpcc_tpu.cc.driver import UCCSDDriver
    from pyscf_mpcc_tpu.scf import RHF as _RHF
    from pyscf_mpcc_tpu import gto as _gto
    mol = _gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                       [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = _RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    rcc = CCSD(mf, frozen=1)
    rcc.conv_tol = 1e-10
    rcc.conv_tol_normt = 1e-8
    rcc.kernel()
    et_r = float(rcc.ccsd_t(tile=2))
    ucc = UCCSDDriver(mf, frozen=1)
    ucc.conv_tol = 1e-10
    ucc.conv_tol_normt = 1e-8
    ucc.kernel()
    et_u = float(ucc.ccsd_t())
    assert abs(ucc.e_corr - rcc.e_corr) < 1e-8
    assert abs(et_u - et_r) < 1e-9
