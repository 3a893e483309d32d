"""UCCSD tests: per-iteration equivalence with the spin-orbital oracle
(the decisive check — all ~100 spin-blocked terms must match exactly),
closed-shell equivalence with RCCSD, and the unrestricted MP-CC freeze."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import gccsd_slow, uccsd
from pyscf_mpcc_tpu.mpcc import umpccsd
from pyscf_mpcc_tpu.scf import RHF, UHF


def _h2o_rhf():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    return mf


def _o2_uhf():
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    return mf


def _ueris(mf):
    if np.asarray(mf.mo_coeff).ndim == 3:
        return uccsd.eris_from_scf(mf)
    dm = mf.make_rdm1()
    f = mf.get_fock(dm)
    eri = gto.intor_eri(mf.mol)
    na, nb = mf.mol.nelec
    return uccsd.make_eris_incore(eri, mf.mo_coeff, mf.mo_coeff, f, f, na, nb)


def _so_blocks(mf, t1_so, t2_so):
    na, nb = mf.mol.nelec
    nmo = np.asarray(mf.mo_coeff).shape[-1]
    nva, nvb = nmo - na, nmo - nb
    o_a, o_b = slice(0, na), slice(na, na + nb)
    v_a, v_b = slice(0, nva), slice(nva, nva + nvb)
    return ((t1_so[o_a, v_a], t1_so[o_b, v_b]),
            (t2_so[o_a, o_a, v_a, v_a], t2_so[o_a, o_b, v_a, v_b],
             t2_so[o_b, o_b, v_b, v_b]))


@pytest.mark.parametrize("mf_fn", [_h2o_rhf, _o2_uhf])
def test_jacobi_sweep_matches_spin_orbital(mf_fn):
    mf = mf_fn()
    so = gccsd_slow.eris_from_scf(mf)
    _, t1_so, t2_so = gccsd_slow.init_amps(so)
    ue = _ueris(mf)
    _, t1u, t2u = uccsd.init_amps(ue)
    for _ in range(2):
        t1_so, t2_so = gccsd_slow.update_amps(t1_so, t2_so, so)
        t1u, t2u = uccsd.update_amps(t1u, t2u, ue)
    ref1, ref2 = _so_blocks(mf, t1_so, t2_so)
    for a, b in zip((*t1u, *t2u), (*ref1, *ref2)):
        assert np.abs(np.asarray(a) - b).max() < 1e-12


def test_uccsd_converges_o2():
    mf = _o2_uhf()
    ue = _ueris(mf)
    conv, e, t1, t2 = uccsd.kernel(ue, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100)
    assert conv
    so = gccsd_slow.eris_from_scf(mf)
    e_so, *_ , conv_so = gccsd_slow.kernel(so, conv_tol=1e-10,
                                           conv_tol_normt=1e-8, max_cycle=200)
    assert conv_so
    assert abs(e - e_so) < 1e-8


def test_uccsd_device_diis_matches_host():
    """UCCSD with the on-device DIIS ring (host-solve hybrid) reaches the
    same fixed point as the host ring."""
    mf = _o2_uhf()
    ue = _ueris(mf)
    conv_h, e_h, *_ = uccsd.kernel(ue, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100)
    conv_d, e_d, *_ = uccsd.kernel(ue, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100, diis_backend="device")
    assert conv_h and conv_d
    assert abs(e_h - e_d) < 1e-8


def test_umpccsd_all_frozen_is_mp2():
    mf = _o2_uhf()
    ue = _ueris(mf)
    emp2, _, _ = uccsd.init_amps(ue)
    conv, e, t1, t2 = umpccsd.kernel(
        ue, act_hole=([0], [0]), act_particle=([0], [0]),
        idx_s=list(range(4)), idx_d=list(range(16)),
        conv_tol=1e-10, conv_tol_normt=1e-8)
    assert conv
    # frozen doubles stay at MP2; t1 bath is the (near-zero) SCF guess
    assert abs(e - float(emp2)) < 1e-8


def test_umpccsd_none_frozen_is_uccsd():
    mf = _o2_uhf()
    ue = _ueris(mf)
    conv, e, *_ = umpccsd.kernel(
        ue, act_hole=([0], [0]), act_particle=([0], [0]), idx_s=[], idx_d=[],
        conv_tol=1e-10, conv_tol_normt=1e-8, max_cycle=100)
    conv2, e2, *_ = uccsd.kernel(ue, conv_tol=1e-10, conv_tol_normt=1e-8,
                                 max_cycle=100)
    assert conv and conv2
    assert abs(e - e2) < 1e-9
