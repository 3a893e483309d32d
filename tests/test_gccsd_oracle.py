"""Cross-validation of the fast JAX RCCSD against the textbook spin-orbital
oracle (the reference's _slow-module strategy, SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.cc import gccsd_slow, gccsd_t_slow, rccsd
from pyscf_mpcc_tpu.cc import eris as eris_mod


def _h2o_sto3g():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    return mol, mf


def test_rccsd_matches_spin_orbital_oracle():
    mol, mf = _h2o_sto3g()
    so_eris = gccsd_slow.eris_from_scf(mf)
    e_so, t1_so, t2_so, conv_so = gccsd_slow.kernel(
        so_eris, conv_tol=1e-11, conv_tol_normt=1e-9, max_cycle=200)
    assert conv_so

    nocc = mol.nelectron // 2
    eri_ao = gto.intor_eri(mol)
    dm = mf.make_rdm1()
    er = eris_mod.make_eris_incore(eri_ao, mf.mo_coeff, mf.get_fock(dm), nocc)
    conv, e_r, t1, t2 = rccsd.kernel(er, conv_tol=1e-11,
                                     conv_tol_normt=1e-9, max_cycle=200)
    assert conv
    assert abs(e_r - e_so) < 1e-9

    # amplitude-level agreement: mixed-spin t2 block == spatial t2
    na = nocc  # alpha occ count
    # spin-orbital order [occ_a, occ_b, vir_a, vir_b]
    nvir = t1.shape[1]
    t2_mixed = t2_so[:na, na:, :nvir, nvir:]
    assert np.abs(np.asarray(t2) - t2_mixed).max() < 1e-7
    assert np.abs(np.asarray(t1) - t1_so[:na, :nvir]).max() < 1e-7


def test_per_iteration_jacobi_equivalence():
    """From the same MP2 start, one Jacobi sweep of the spin-adapted and
    spin-orbital equations must produce identical amplitudes."""
    mol, mf = _h2o_sto3g()
    so_eris = gccsd_slow.eris_from_scf(mf)
    _, t1_so, t2_so = gccsd_slow.init_amps(so_eris)
    t1_so, t2_so = gccsd_slow.update_amps(t1_so, t2_so, so_eris)

    nocc = mol.nelectron // 2
    eri_ao = gto.intor_eri(mol)
    dm = mf.make_rdm1()
    er = eris_mod.make_eris_incore(eri_ao, mf.mo_coeff, mf.get_fock(dm), nocc)
    _, t1, t2 = rccsd.init_amps(er)
    t1, t2 = rccsd.update_amps(t1, t2, er)

    nvir = t1.shape[1]
    assert np.abs(np.asarray(t1) - t1_so[:nocc, :nvir]).max() < 1e-10
    assert np.abs(np.asarray(t2) - t2_so[:nocc, nocc:, :nvir, nvir:]).max() < 1e-10
