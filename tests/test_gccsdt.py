"""Factorized CCSDT / CCSDT-3 vs the exact determinant-space oracle.

The decisive checks: (1) all three residuals match the exact projections
<mu| e^{-T} H e^{T} |0> at RANDOM amplitudes to machine precision;
(2) converged full CCSDT equals FCI for a three-electron system;
(3) the active-space (pert_triples) restriction and model flags behave."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.ci.fci_slow import FCI
from pyscf_mpcc_tpu.cc import (eom_slow, gccsd_slow, gccsdt_oracle,
                               gccsdt_slow)
from pyscf_mpcc_tpu.scf import RHF, UHF


def _h4():
    mol = gto.M(atom="H 0 0 0; H 0 0 0.9; H 0 0 1.8; H 0 0 2.7",
                basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-11
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    return mol, mf, so, eom_slow.h_so_from_eris(so)


def _random_amps(nocc, nvir, seed=7):
    rng = np.random.RandomState(seed)
    t1 = rng.randn(nocc, nvir) * 0.05
    t2 = rng.randn(nocc, nocc, nvir, nvir) * 0.05
    t2 = t2 - t2.transpose(1, 0, 2, 3)
    t2 = t2 - t2.transpose(0, 1, 3, 2)
    t3 = rng.randn(nocc, nocc, nocc, nvir, nvir, nvir) * 0.02
    t3 = gccsdt_slow._a36(t3) / 36.0
    return t1, t2, t3


def test_residuals_match_exact_projections():
    mol, mf, so, h_so = _h4()
    t1, t2, t3 = _random_amps(so.nocc, so.nso - so.nocc)
    R1, R2, R3 = gccsdt_slow.residuals(t1, t2, t3, so, h_so, model="ccsdt")
    o1, o2, o3, _ = gccsdt_oracle.residuals(h_so, so.ints, t1, t2, t3,
                                            so.nocc, so.nso)
    assert np.abs(R1 - o1).max() < 1e-12
    assert np.abs(R2 - o2).max() < 1e-12
    assert np.abs(R3 - o3).max() < 1e-12


def test_ccsdt_is_fci_for_three_electrons():
    mol = gto.M(atom="H 0 0 0; H 0 0 0.9; H 0 0 1.8", basis="sto-3g",
                spin=1)
    mf = UHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-11
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    h_so = eom_slow.h_so_from_eris(so)
    e, *_, conv = gccsdt_slow.kernel(so, h_so, model="ccsdt",
                                     conv_tol=1e-12, conv_tol_normt=1e-10,
                                     max_cycle=200)
    assert conv
    w, _ = FCI(h_so, so.ints, so.nocc, so.nso).kernel(1)
    e_elec = mf.e_tot - mol.energy_nuc() + e
    assert abs(e_elec - w[0]) < 1e-10


def test_model_hierarchy_and_active_space():
    mol, mf, so, h_so = _h4()
    es = {}
    for model in ("ccsdt-1", "ccsdt-3", "ccsdt"):
        e, *_ , conv = gccsdt_slow.kernel(so, h_so, model=model,
                                          conv_tol=1e-11,
                                          conv_tol_normt=1e-9,
                                          max_cycle=200)
        assert conv, model
        es[model] = e
    # the models are distinct but within triples-correction scale
    assert abs(es["ccsdt"] - es["ccsdt-3"]) > 1e-10
    assert abs(es["ccsdt"] - es["ccsdt-1"]) > 1e-10
    assert abs(es["ccsdt"] - es["ccsdt-1"]) < 5e-3

    # CCSD limit: empty active space == plain CCSD
    e_cc, *_ = gccsd_slow.kernel(so, conv_tol=1e-12, conv_tol_normt=1e-11,
                                 max_cycle=300)
    e0, *_ , c0 = gccsdt_slow.kernel(so, h_so, model="ccsdt",
                                     act_hole=[], act_particle=[],
                                     conv_tol=1e-11, conv_tol_normt=1e-9,
                                     max_cycle=200)
    assert c0
    assert abs(e0 - e_cc) < 1e-9

    # active-space T3 lies between CCSD and full CCSDT
    e_act, _, _, t3_act, c1 = gccsdt_slow.kernel(
        so, h_so, model="ccsdt", act_hole=[2, 3], act_particle=[0, 1],
        conv_tol=1e-11, conv_tol_normt=1e-9, max_cycle=200)
    assert c1
    # inactive t3 blocks really are zero
    mask = gccsdt_slow.t3_mask([2, 3], [0, 1], so.nocc, so.nso - so.nocc)
    assert np.abs(np.where(mask, 0.0, t3_act)).max() == 0.0
    assert min(es["ccsdt"], e_cc) - 1e-9 <= e_act <= max(es["ccsdt"],
                                                         e_cc) + 1e-9


def test_umpcc_pert_triples_limits():
    """kernel_pert_triples: empty triples+no freeze == CCSD; full active
    +no freeze == full CCSDT; frozen-bath variant converges in between."""
    from pyscf_mpcc_tpu.mpcc import umpccsd

    mol = gto.M(atom="H 0 0 0; H 0 0 0.9; H 0 0 1.8; H 0 0 2.7",
                basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-11
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    h_so = eom_slow.h_so_from_eris(so)
    e_cc, *_ = gccsd_slow.kernel(so, conv_tol=1e-12, conv_tol_normt=1e-11,
                                 max_cycle=300)
    e_t, *_ , cT = gccsdt_slow.kernel(so, h_so, model="ccsdt",
                                      conv_tol=1e-11, conv_tol_normt=1e-9,
                                      max_cycle=200)
    assert cT
    # empty active space, nothing frozen -> CCSD
    e0, *_ , c0 = umpccsd.kernel_pert_triples(
        mf, act_hole=([], []), act_particle=([], []), idx_s=[], idx_d=[],
        model="ccsdt", conv_tol=1e-11, conv_tol_normt=1e-9)
    assert c0 and abs(e0 - e_cc) < 1e-9
    # full active space, nothing frozen -> full CCSDT
    e1, *_ , c1 = umpccsd.kernel_pert_triples(
        mf, act_hole=([0, 1], [0, 1]), act_particle=([0, 1], [0, 1]),
        idx_s=[], idx_d=[], model="ccsdt", conv_tol=1e-11,
        conv_tol_normt=1e-9)
    assert c1 and abs(e1 - e_t) < 1e-9
    # active triples + frozen bath doubles: converges between the limits
    e2, *_ , c2 = umpccsd.kernel_pert_triples(
        mf, act_hole=([1], [1]), act_particle=([0], [0]),
        idx_s=[], idx_d=list(range(15)), model="ccsdt-3",
        conv_tol=1e-10, conv_tol_normt=1e-8)
    assert c2
    assert abs(e2 - e_cc) < 0.05


def test_env_triples_one_shot_matches_t_partition():
    """(one_shot, bare, linear) environment triples == the (T)-energy
    partition of cc/gccsd_t_slow — and unmasked == the full (T)."""
    from pyscf_mpcc_tpu.cc import gccsd_t_slow

    mol, mf, so, h_so = _h4()
    e_cc, t1, t2, conv = gccsd_slow.kernel(so, conv_tol=1e-12,
                                           conv_tol_normt=1e-11,
                                           max_cycle=300)
    assert conv
    nocc, nvir = t1.shape
    # unmasked one-shot == full (T)
    et_ref = gccsd_t_slow.kernel(t1, t2, so)
    e_all, _, _ = gccsdt_slow.env_triples_kernel(
        so, h_so, t1, t2, act_hole=[], act_particle=[],
        dress_t1=False, driving="linear", one_shot=True)
    assert abs(e_all - et_ref) < 1e-11
    # env-masked one-shot == the exclude_active partition
    ah, ap = [2, 3], [0, 1]
    et_env = gccsd_t_slow.kernel(t1, t2, so, act_hole=ah, act_particle=ap,
                                 mode="exclude_active")
    e_env, t3, _ = gccsdt_slow.env_triples_kernel(
        so, h_so, t1, t2, act_hole=ah, act_particle=ap,
        dress_t1=False, driving="linear", one_shot=True)
    assert abs(e_env - et_env) < 1e-11
    # the active t3 block is exactly zero
    mask = gccsdt_slow.t3_mask(ah, ap, nocc, nvir)
    assert np.abs(np.where(mask, t3, 0.0)).max() == 0.0


def test_env_triples_iterative_converges():
    """The dressed iterative solver converges and stays in the same scale
    as the one-shot correction."""
    mol, mf, so, h_so = _h4()
    e_cc, t1, t2, conv = gccsd_slow.kernel(so, conv_tol=1e-12,
                                           conv_tol_normt=1e-11,
                                           max_cycle=300)
    ah, ap = [2, 3], [0, 1]
    e1, _, _ = gccsdt_slow.env_triples_kernel(
        so, h_so, t1, t2, act_hole=ah, act_particle=ap,
        dress_t1=False, driving="linear", one_shot=True)
    e2, _, c2 = gccsdt_slow.env_triples_kernel(
        so, h_so, t1, t2, act_hole=ah, act_particle=ap,
        model="ccsdt-3", conv_tol=1e-10)
    assert c2
    assert abs(e2 - e1) < 5.0 * abs(e1) + 1e-9
    # the reference's env-amplitude pairing variant also runs
    e3, _, c3 = gccsdt_slow.env_triples_kernel(
        so, h_so, t1, t2, act_hole=ah, act_particle=ap,
        model="ccsdt-3", conv_tol=1e-10, env_amplitudes=True)
    assert c3
