"""Inactive (environment) triples corrections: the (T)-like energy with the
all-active block excluded (fork's uccsd_t_inactive_* capability).

Checks: element-partition additivity (full = active-only + active-excluded)
and spatial/spin-orbital implementation agreement on a closed-shell
reference."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import (ccsd_t, eris as eris_mod, gccsd_slow,
                               gccsd_t_slow, rccsd)
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz


def test_additivity_and_spatial_spin_agreement():
    d = h2o_ccpvdz(geom="tilt")
    er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                   d["fock_ao"], 5)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-11, conv_tol_normt=1e-9,
                                   max_cycle=200)
    assert conv
    act_hole = [2, 3, 4]
    act_particle = [0, 1, 2, 3, 4]

    et_full = ccsd_t.kernel(t1, t2, er, tile=8)
    et_env = ccsd_t.kernel(t1, t2, er, tile=8, act_hole=act_hole,
                           act_particle=act_particle, mode="exclude_active")
    et_act = ccsd_t.kernel(t1, t2, er, tile=8, act_hole=act_hole,
                           act_particle=act_particle, mode="only_active")
    assert abs(et_full - (et_env + et_act)) < 1e-12
    assert abs(et_act) > 1e-8  # the active block carries weight
    assert abs(et_env) > 1e-8


def test_spin_orbital_env_matches_spatial():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    e_so, t1s, t2s, conv = gccsd_slow.kernel(so, conv_tol=1e-11,
                                             conv_tol_normt=1e-9,
                                             max_cycle=200)
    assert conv
    eri = gto.intor_eri(mol)
    er = eris_mod.make_eris_incore(eri, mf.mo_coeff,
                                   mf.get_fock(mf.make_rdm1()), 5)
    conv, e_r, t1, t2 = rccsd.kernel(er, conv_tol=1e-11,
                                     conv_tol_normt=1e-9, max_cycle=200)
    assert conv

    act_hole = [3, 4]
    act_particle = [0, 1]
    # spin-orbital indices: occ block [occ_a(5), occ_b(5)], vir similar
    na, nva = 5, 2
    so_hole = act_hole + [na + h for h in act_hole]
    so_part = act_particle + [nva + p for p in act_particle]

    for mode in ("exclude_active", "only_active"):
        et_spatial = ccsd_t.kernel(t1, t2, er, tile=2, act_hole=act_hole,
                                   act_particle=act_particle, mode=mode)
        et_spin = gccsd_t_slow.kernel(t1s, t2s, so, act_hole=so_hole,
                                      act_particle=so_part, mode=mode)
        assert abs(et_spatial - et_spin) < 1e-9
