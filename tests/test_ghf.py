"""GHF SCF (scf/ghf.py) + device GCCSD (cc/gccsd.py).

Anchors: collinear GHF reproduces RHF (closed shell) and UHF (triplet
O2) exactly; DF-GHF matches incore; the device GCCSD matches the NumPy
oracle and the restricted/unrestricted engines on the same reference."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import gccsd, gccsd_slow
from pyscf_mpcc_tpu.scf import GHF, RHF, UHF, convert_to_ghf


def _h2o(basis="sto-3g"):
    return gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                       [1, (0, 0.757, 0.587)]], basis=basis)


def test_ghf_matches_rhf_closed_shell():
    mol = _h2o("6-31g")
    mf_r = RHF(mol)
    mf_r.conv_tol = 1e-12
    mf_r.kernel()
    mf_g = GHF(mol)
    mf_g.conv_tol = 1e-12
    mf_g.kernel()
    assert mf_g.converged
    assert abs(mf_g.e_tot - mf_r.e_tot) < 1e-9


def test_ghf_matches_uhf_triplet_o2():
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf_u = UHF(mol)
    mf_u.conv_tol = 1e-12
    mf_u.kernel()
    mf_g = GHF(mol)
    mf_g.conv_tol = 1e-12
    mf_g.kernel()
    assert mf_g.converged
    # the collinear UHF solution is a GHF stationary point; GHF must
    # find it (or something lower — sto-3g O2 has none lower)
    assert mf_g.e_tot < mf_u.e_tot + 1e-9


def test_ghf_df_matches_rhf_df():
    """The spin-blocked DF K build is exact: GHF under DF must equal
    RHF under the SAME fitting basis to machine precision."""
    mol = _h2o()
    mr = RHF(mol).density_fit()
    mr.conv_tol = 1e-12
    mr.kernel()
    mfd = GHF(mol).density_fit()
    mfd.conv_tol = 1e-12
    mfd.kernel()
    assert mfd.converged
    assert abs(mfd.e_tot - mr.e_tot) < 1e-9


def test_convert_to_ghf_preserves_energy():
    mol = _h2o()
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    mg = convert_to_ghf(mf)
    assert abs(mg.e_tot - mf.e_tot) < 1e-10
    mol2 = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mu = UHF(mol2)
    mu.conv_tol = 1e-12
    mu.kernel()
    mg2 = convert_to_ghf(mu)
    assert abs(mg2.e_tot - mu.e_tot) < 1e-10


def test_gccsd_device_matches_oracle_h2o():
    mol = _h2o()
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    e_o, t1_o, t2_o, conv_o = gccsd_slow.kernel(so, conv_tol=1e-11,
                                                conv_tol_normt=1e-9)
    assert conv_o
    cc = gccsd.GCCSD(mf).run(conv_tol=1e-11, conv_tol_normt=1e-9)
    assert cc.converged
    assert abs(cc.e_corr - e_o) < 1e-9


def test_gccsd_device_matches_oracle_o2_triplet():
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    e_o, _, _, conv_o = gccsd_slow.kernel(so, conv_tol=1e-11,
                                          conv_tol_normt=1e-9)
    assert conv_o
    cc = gccsd.GCCSD(mf).run(conv_tol=1e-11, conv_tol_normt=1e-9)
    assert cc.converged
    assert abs(cc.e_corr - e_o) < 1e-9


def test_gccsd_matches_rccsd():
    from pyscf_mpcc_tpu.cc import eris as eris_mod, rccsd
    mol = _h2o("6-31g")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    er = eris_mod.make_eris_incore(np.asarray(gto.intor_eri(mol)),
                                   np.asarray(mf.mo_coeff),
                                   np.asarray(mf.get_fock(mf.make_rdm1())),
                                   mol.nelectron // 2)
    conv, e_r, _, _ = rccsd.kernel(er, conv_tol=1e-11,
                                   conv_tol_normt=1e-9, max_cycle=100)
    assert conv
    cc = gccsd.GCCSD(mf).run(conv_tol=1e-11, conv_tol_normt=1e-9)
    assert cc.converged
    assert abs(cc.e_corr - e_r) < 1e-8
