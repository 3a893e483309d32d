"""MP-CC hybrid tests.  Oracles per SURVEY.md section 4: with every block
frozen the energy is exactly the (bath) MP2 energy; with nothing frozen it
is exactly CCSD; masks match the reference's np.ix_ enumeration."""

import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import eris as eris_mod, rccsd
from pyscf_mpcc_tpu.mpcc import rmpccsd
from pyscf_mpcc_tpu.mpcc.masks import (doubles_blocks, frozen_masks,
                                       singles_blocks)
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

E_MP2 = -0.2040199672883385
E_CCSD = -0.2133432312951


def _eris():
    d = h2o_ccpvdz()
    return eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                     d["fock_ao"], 5)


def test_masks_match_reference_ix_enumeration():
    nocc, nvir = 5, 7
    act_hole = np.array([2, 4])
    act_particle = np.array([0, 3, 5])
    inact_hole = np.delete(np.arange(nocc), act_hole)
    inact_particle = np.delete(np.arange(nvir), act_particle)

    s = singles_blocks(act_hole, act_particle, nocc, nvir)
    ref_s = [np.ix_(act_hole, inact_particle),
             np.ix_(inact_hole, act_particle),
             np.ix_(inact_hole, inact_particle),
             np.ix_(act_hole, act_particle)]
    for mask, ix in zip(s, ref_s):
        ref = np.zeros((nocc, nvir), dtype=bool)
        ref[ix] = True
        assert (mask == ref).all()

    d = doubles_blocks(act_hole, act_particle, nocc, nvir)
    ah, ih, ap, ip = act_hole, inact_hole, act_particle, inact_particle
    ref_d = [
        np.ix_(ah, ah, ip, ap), np.ix_(ih, ah, ip, ap),
        np.ix_(ah, ih, ip, ap), np.ix_(ih, ih, ip, ap),
        np.ix_(ah, ah, ap, ip), np.ix_(ih, ah, ap, ip),
        np.ix_(ah, ih, ap, ip), np.ix_(ih, ih, ap, ip),
        np.ix_(ah, ah, ip, ip), np.ix_(ih, ah, ip, ip),
        np.ix_(ah, ih, ip, ip), np.ix_(ih, ih, ip, ip),
        np.ix_(ih, ah, ap, ap), np.ix_(ah, ih, ap, ap),
        np.ix_(ih, ih, ap, ap), np.ix_(ah, ah, ap, ap),
    ]
    assert len(d) == 16
    for mask, ix in zip(d, ref_d):
        ref = np.zeros((nocc, nocc, nvir, nvir), dtype=bool)
        ref[ix] = True
        assert (mask == ref).all()
    # the 16 blocks tile the full tensor exactly
    total = np.zeros((nocc, nocc, nvir, nvir), dtype=int)
    for mask in d:
        total += mask
    assert (total == 1).all()


def test_all_frozen_is_mp2():
    er = _eris()
    conv, e, t1, t2 = rmpccsd.kernel(
        er, act_hole=[0, 1], act_particle=[0, 1],
        idx_s=list(range(4)), idx_d=list(range(16)),
        conv_tol=1e-10, conv_tol_normt=1e-8)
    assert conv
    # t1 bath is the SCF t1 guess (zero for canonical HF), t2 bath is MP2
    assert abs(e - E_MP2) < 1e-9


def test_nothing_frozen_is_ccsd():
    er = _eris()
    conv, e, t1, t2 = rmpccsd.kernel(
        er, act_hole=[0, 1], act_particle=[0, 1], idx_s=[], idx_d=[],
        conv_tol=1e-10, conv_tol_normt=1e-8, max_cycle=100)
    assert conv
    assert abs(e - E_CCSD) < 1e-7


def test_partial_freeze_between_mp2_and_ccsd():
    """MPCCSD(4,2)-style: active t1 everywhere, doubles frozen unless all
    four indices are active (freeze all but block 15)."""
    er = _eris()
    act_hole = [2, 3, 4]
    act_particle = [0, 1, 2, 3]
    conv, e, t1, t2 = rmpccsd.kernel(
        er, act_hole, act_particle, idx_s=[],
        idx_d=list(range(15)),  # only the all-active doubles block relaxes
        conv_tol=1e-10, conv_tol_normt=1e-8, max_cycle=100)
    assert conv
    assert E_CCSD - 1e-9 < e < E_MP2 + 1e-9
    # frozen blocks really are at their MP2 values
    _, t1_0, t2_0 = rccsd.init_amps(er)
    m1, m2 = frozen_masks(act_hole, act_particle, 5, er.nvir,
                          [], list(range(15)))
    assert float(jnp.abs(jnp.where(m2, t2 - t2_0, 0.0)).max()) < 1e-12


def test_oomp2_bath_update_limits():
    """bath_update='mp2': with every block in the bath the fixed point is
    iterative MP2; with no frozen blocks it is CCSD."""
    er = _eris()
    conv, e, t1, t2 = rmpccsd.kernel(
        er, act_hole=[0], act_particle=[0],
        idx_s=list(range(4)), idx_d=list(range(16)),
        conv_tol=1e-10, conv_tol_normt=1e-8, bath_update="mp2",
        max_cycle=100)
    assert conv
    assert abs(e - E_MP2) < 1e-8
    conv, e, t1, t2 = rmpccsd.kernel(
        er, act_hole=[0], act_particle=[0], idx_s=[], idx_d=[],
        conv_tol=1e-10, conv_tol_normt=1e-8, bath_update="mp2",
        max_cycle=100)
    assert conv
    assert abs(e - E_CCSD) < 1e-7


def test_oomp2_bath_between():
    er = _eris()
    conv, e, *_ = rmpccsd.kernel(
        er, act_hole=[2, 3, 4], act_particle=[0, 1, 2, 3],
        idx_s=[], idx_d=list(range(15)),
        conv_tol=1e-10, conv_tol_normt=1e-8, bath_update="mp2",
        max_cycle=100)
    assert conv
    assert E_CCSD - 1e-9 < e < E_MP2 + 1e-9
