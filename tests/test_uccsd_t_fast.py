"""Fast open-shell UCCSD(T) tile kernel (cc/uccsd_t.py) vs the
spin-orbital oracle (cc/gccsd_t_slow.py) and the closed-shell engine.

Reference capability: pyscf/lib/cc/uccsd_t.c:278,532 (aaa/baa channels);
driver pyscf/cc/uccsd_t.py:30."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import (ccsd_t, eris as eris_mod, gccsd_slow,
                               gccsd_t_slow, rccsd, uccsd, uccsd_t)
from pyscf_mpcc_tpu.scf import RHF, UHF


def _o2_solved():
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    ue = uccsd.eris_from_scf(mf)
    conv, e, t1, t2 = uccsd.kernel(ue, conv_tol=1e-11, conv_tol_normt=1e-9,
                                   max_cycle=200)
    assert conv
    return mol, mf, ue, t1, t2


def test_o2_matches_spin_orbital_oracle():
    mol, mf, ue, t1, t2 = _o2_solved()
    na, nb = mol.nelec
    T1, T2 = uccsd.to_spin_orbital(t1, t2, (na, nb))
    so = gccsd_slow.eris_from_scf(mf)
    et_ref = gccsd_t_slow.kernel(T1, T2, so)
    # multi-tile path (V = 4 spin-orbital virtuals, tile=2 -> 4 triples)
    et = uccsd_t.kernel(t1, t2, ue, tile=2)
    assert abs(et - et_ref) < 1e-11
    # single padded tile
    et8 = uccsd_t.kernel(t1, t2, ue, tile=8)
    assert abs(et8 - et_ref) < 1e-11
    assert abs(et_ref) > 1e-6  # O2 triplet has a real (T) contribution


def test_o2_df_matches_incore():
    mol, mf, ue, t1, t2 = _o2_solved()
    from pyscf_mpcc_tpu.df.addons import aug_etb
    from pyscf_mpcc_tpu.df.df import DF
    with_df = DF(mol, auxbasis=aug_etb(mol))
    B = with_df.B_ao()
    dm = mf.make_rdm1()
    j, k = mf.get_jk(dm)
    h = mf.get_hcore()
    fa, fb = h + j[0] + j[1] - k[0], h + j[0] + j[1] - k[1]
    na, nb = mol.nelec
    ue_df = uccsd.make_eris_df(B, mf.mo_coeff[0], mf.mo_coeff[1],
                               fa, fb, na, nb)
    conv, e, t1d, t2d = uccsd.kernel(ue_df, conv_tol=1e-11,
                                     conv_tol_normt=1e-9, max_cycle=200)
    assert conv
    et_inc = uccsd_t.kernel(t1d, t2d, ue, tile=2)
    et_df = uccsd_t.kernel(t1d, t2d, ue_df, tile=2)
    # same amplitudes; only the three-virtual integrals differ (DF error)
    assert abs(et_df - et_inc) < 5e-5
    # and the DF path agrees with the oracle evaluated on DF-quality eris
    # to tight tolerance via the incore tensors of the same DF object
    ue_df_mat = uccsd.make_eris_incore(
        np.einsum("Lpq,Lrs->pqrs", B, B), mf.mo_coeff[0], mf.mo_coeff[1],
        fa, fb, na, nb)
    et_mat = uccsd_t.kernel(t1d, t2d, ue_df_mat, tile=2)
    assert abs(et_df - et_mat) < 1e-10


def test_closed_shell_matches_restricted_kernel():
    from pyscf_mpcc_tpu.testutil import h2o_ccpvdz
    d = h2o_ccpvdz(geom="tilt")
    er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                   d["fock_ao"], 5)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-11, conv_tol_normt=1e-9,
                                   max_cycle=200)
    assert conv
    et_r = ccsd_t.kernel(t1, t2, er, tile=8)
    # same solution through the unrestricted kernel
    fock = np.asarray(er.fock)
    na = 5
    ue = uccsd.make_eris_incore(d["eri_ao"], d["mo_coeff"], d["mo_coeff"],
                                d["fock_ao"], d["fock_ao"], na, na)
    t1u = (t1, t1)
    t2u = (t2 - t2.transpose(0, 1, 3, 2), t2, t2 - t2.transpose(0, 1, 3, 2))
    et_u = uccsd_t.kernel(t1u, t2u, ue, tile=8)
    assert abs(et_u - et_r) < 1e-10


def test_active_partition_additive():
    mol, mf, ue, t1, t2 = _o2_solved()
    ah = ([5, 6, 7, 8], [5, 6])
    ap = ([0], [0, 1])
    et_full = uccsd_t.kernel(t1, t2, ue, tile=2)
    et_env = uccsd_t.kernel(t1, t2, ue, tile=2, act_hole=ah,
                            act_particle=ap, mode="exclude_active")
    et_act = uccsd_t.kernel(t1, t2, ue, tile=2, act_hole=ah,
                            act_particle=ap, mode="only_active")
    assert abs(et_full - (et_env + et_act)) < 1e-12
    # cross-check the partition against the spin-orbital oracle
    na, nb = mol.nelec
    va = t1[0].shape[1]
    T1, T2 = uccsd.to_spin_orbital(t1, t2, (na, nb))
    so = gccsd_slow.eris_from_scf(mf)
    so_hole = list(ah[0]) + [na + h for h in ah[1]]
    so_part = list(ap[0]) + [va + p for p in ap[1]]
    et_env_ref = gccsd_t_slow.kernel(T1, T2, so, act_hole=so_hole,
                                     act_particle=so_part,
                                     mode="exclude_active")
    assert abs(et_env - et_env_ref) < 1e-11


def test_mesh_sharded_matches_serial():
    import jax
    from jax.sharding import Mesh
    mol, mf, ue, t1, t2 = _o2_solved()
    et = uccsd_t.kernel(t1, t2, ue, tile=2)
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("x",))
    et_m = uccsd_t.kernel(t1, t2, ue, tile=2, mesh=mesh)
    assert abs(et_m - et) < 1e-12


def test_driver_frozen_uccsd_t_runs():
    """Frozen-core UCCSD(T) through the driver (round-1 advisor finding:
    the oracle path crashed for frozen>0; the tiled engine consumes the
    frozen-sliced eris container)."""
    from pyscf_mpcc_tpu.cc.driver import UCCSDDriver
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    cc = UCCSDDriver(mf, frozen=2)
    cc.conv_tol = 1e-10
    cc.conv_tol_normt = 1e-8
    cc.kernel()
    et = cc.ccsd_t(tile=2)
    assert np.isfinite(et)
    assert abs(et) < 0.1  # a correction, not a correlation energy
