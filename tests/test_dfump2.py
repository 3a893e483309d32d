"""DF-UMP2 relaxed/unrelaxed densities (mp/dfump2.py)."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.mp.dfump2 import DFUMP2
from pyscf_mpcc_tpu.scf import UHF


def _mf(dh=None):
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g",
                unit="angstrom", spin=2)
    mf = UHF(mol).density_fit()
    if dh is not None:
        mf.hcore = mf.hcore + dh
    mf.conv_tol = 1e-13
    mf.kernel()
    return mf


def test_dfump2_energy_matches_ump2_df_kernel():
    mf = _mf()
    from pyscf_mpcc_tpu.mp import ump2
    pt = DFUMP2(mf).run()
    e_ref, _ = ump2.df_kernel_from_scf(mf)
    assert abs(pt.e_corr - e_ref) < 1e-11


def test_unrelaxed_rdm1_trace():
    mf = _mf()
    pt = DFUMP2(mf).run()
    g = pt.make_rdm1(relaxed=False)
    S = np.asarray(mf.get_ovlp())
    assert abs(np.sum(g * 0) + np.trace(g @ S)
               - mf.mol.nelectron) < 1e-8


def test_relaxed_rdm1_finite_field():
    rng = np.random.default_rng(11)
    nao = _mf().mo_coeff[0].shape[0]
    V = rng.standard_normal((nao, nao)) * 0.005
    V = V + V.T

    def e_tot(x):
        return DFUMP2(_mf(dh=x * V)).run().e_tot

    x = 2e-4
    de_fd = (e_tot(x) - e_tot(-x)) / (2 * x)
    pt = DFUMP2(_mf()).run()
    g_rel = pt.make_rdm1(relaxed=True)
    de_an = float(np.sum(g_rel * V))
    assert abs(de_an - de_fd) < 5e-7
    g_unrel = pt.make_rdm1(relaxed=False)
    assert abs(float(np.sum(g_unrel * V)) - de_fd) > 5 * abs(de_an - de_fd)
