"""Active-space iterative triples (CCSDT-1 level) tests.

The T3->T1/T2 feedback contractions are validated against exact
determinant-space matrix elements <mu| H T3 |0> from the FCI oracle; the
W generator is cross-checked against the pinned (T) machinery; the
active-space restriction interpolates between CCSD and full CCSDT-1."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import gccsd_slow, gccsdt1_slow
from pyscf_mpcc_tpu.ci.fci_slow import FCI
from pyscf_mpcc_tpu.scf import RHF


@pytest.fixture(scope="module")
def h2o_sto3g():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    return mol, mf, gccsd_slow.eris_from_scf(mf)


def _anti3(t, which):
    from itertools import permutations
    out = np.zeros_like(t)
    for perm in permutations(range(3)):
        sgn = 1
        p = list(perm)
        for i in range(3):
            for j in range(i + 1, 3):
                if p[i] > p[j]:
                    sgn = -sgn
        if which == "occ":
            out += sgn * t.transpose(*perm, 3, 4, 5)
        else:
            out += sgn * t.transpose(0, 1, 2, *[3 + x for x in perm])
    return out


def test_feedback_matches_fci_matrix_elements(h2o_sto3g):
    mol, mf, so = h2o_sto3g
    nso, nocc = so.nso, so.nocc
    nvir = nso - nocc
    h_so = so.fock.copy()
    for p in range(nso):
        for q in range(nso):
            h_so[p, q] -= sum(so.ints[p, j, q, j] for j in range(nocc))
    f = FCI(h_so, so.ints, nocc, nso)
    rng = np.random.RandomState(3)
    t3 = rng.randn(nocc, nocc, nocc, nvir, nvir, nvir) * 0.01
    t3 = _anti3(_anti3(t3, "occ"), "vir")
    vec = f.apply_t3(t3, nocc)
    sig = f.hamiltonian() @ vec
    g1, g2 = f.project_singles_doubles(sig, nocc)
    r1, r2 = gccsdt1_slow.feedback(t3, so)
    assert np.abs(r1 - g1).max() < 1e-12
    assert np.abs(r2 - g2).max() < 1e-12


def test_w_generator_matches_t_kernel(h2o_sto3g):
    """The full-tensor W equals the (T)-energy machinery's per-triple W."""
    from pyscf_mpcc_tpu.cc import gccsd_t_slow
    mol, mf, so = h2o_sto3g
    e, t1, t2, conv = gccsd_slow.kernel(so, conv_tol=1e-10,
                                        conv_tol_normt=1e-8, max_cycle=100)
    assert conv
    # reconstruct E(T) from the full W tensor and compare with the pinned
    # (T) implementation
    nocc = so.nocc
    eo = np.diag(so.fock)[:nocc]
    ev = np.diag(so.fock)[nocc:]
    d3 = (eo[:, None, None, None, None, None]
          + eo[None, :, None, None, None, None]
          + eo[None, None, :, None, None, None]
          - ev[None, None, None, :, None, None]
          - ev[None, None, None, None, :, None]
          - ev[None, None, None, None, None, :])
    w = gccsdt1_slow.t3_w(t2, so)
    oovv = so.block("oovv")
    v = np.einsum("ia,jkbc->ijkabc", t1, oovv)
    v = v - v.transpose(1, 0, 2, 3, 4, 5) - v.transpose(2, 1, 0, 3, 4, 5)
    v = v - v.transpose(0, 1, 2, 4, 3, 5) - v.transpose(0, 1, 2, 5, 4, 3)
    et_full = np.einsum("ijkabc,ijkabc->", w / d3, w + v) / 36.0
    et_ref = gccsd_t_slow.kernel(t1, t2, so)
    assert abs(et_full - et_ref) < 1e-10


def test_active_space_interpolates(h2o_sto3g):
    mol, mf, so = h2o_sto3g
    e_ccsd, *_, conv = gccsd_slow.kernel(so, conv_tol=1e-10,
                                         conv_tol_normt=1e-8, max_cycle=100)
    assert conv
    # full T3 space
    e_full, t1, t2, t3, conv = gccsdt1_slow.kernel(
        so, conv_tol=1e-9, conv_tol_normt=1e-7, max_cycle=100)
    assert conv
    assert e_full < e_ccsd  # triples lower the energy for H2O
    # empty active space == plain CCSD
    e_none, *_ , conv = gccsdt1_slow.kernel(
        so, act_hole=[], act_particle=[], conv_tol=1e-9,
        conv_tol_normt=1e-7, max_cycle=100)
    assert conv
    assert abs(e_none - e_ccsd) < 1e-8
    # active subset lands between
    nocc, nvir = t1.shape
    e_act, *_ , conv = gccsdt1_slow.kernel(
        so, act_hole=list(range(2, nocc)), act_particle=list(range(nvir)),
        conv_tol=1e-9, conv_tol_normt=1e-7, max_cycle=100)
    assert conv
    assert e_full - 1e-9 <= e_act <= e_ccsd + 1e-9
