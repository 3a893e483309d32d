"""MP2-F12/SP with CABS (mp/mp2f12.py).

Validation:
  * the STG-6G fit is tight and well-conditioned,
  * CABS orbitals are orthonormal and orthogonal to the OBS,
  * B and X reproduce an INDEPENDENT explicit pair-function (brute-force
    Hylleraas) construction in the same extended space exactly,
  * physics: H2/cc-pVDZ MP2-F12 lands at the CBS limit (single pair),
    and (slow, env-gated) frozen-core H2O recovers more correlation
    than MP2/cc-pVTZ from a cc-pVDZ orbital basis.
"""

import os

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.gto import native
from pyscf_mpcc_tpu.mp import mp2f12
from pyscf_mpcc_tpu.scf import RHF

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native engine")


def test_stg_fit_quality():
    g, c = mp2f12.stg_fit(6)
    r = np.linspace(0.05, 8, 500)
    fit = (c[None, :] * np.exp(-np.outer(r * r, g))).sum(1)
    assert np.abs(fit - np.exp(-r)).max() < 5e-3
    assert np.abs(c).max() < 1.0          # well-conditioned expansion


def test_cabs_orthogonality():
    mol = gto.M(atom="He 0 0 0", basis="cc-pvdz", spin=0)
    aux = gto.M(atom="He 0 0 0", basis={"He": [[0, [0.5, 1.0]],
                                               [1, [1.2, 1.0]]]}, spin=0)
    big, perm, cabs = mp2f12.find_cabs(mol, aux)
    s, _ = gto.intor_ovlp_kin(big)
    s = s[np.ix_(perm, perm)]
    np.testing.assert_allclose(cabs.T @ s @ cabs,
                               np.eye(cabs.shape[1]), atol=1e-10)
    assert np.abs(s[:mol.nao] @ cabs).max() < 1e-12


def _he_setup():
    mol = gto.M(atom="He 0 0 0", basis="cc-pvdz", spin=0)
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    cab = []
    for l, n in ((0, 6), (1, 5), (2, 4)):
        for k in range(n):
            cab.append([l, [0.1 * 2.8 ** k, 1.0]])
    aux = gto.M(atom="He 0 0 0", basis={"He": cab}, spin=0)
    return mol, mf, aux


def test_he_b_x_match_bruteforce_pair_function():
    """B and X from energy_f12's explicitly-projected construction must
    equal the literal pair-function evaluation <w|F1+F2-2eps|w> in the
    same extended space."""
    mol, mf, aux = _he_setup()
    zeta = 1.0
    big, perm, cabs = mp2f12.find_cabs(mol, aux)
    nao, nocc = mol.nao, 1
    Pc = np.hstack([np.vstack([mf.mo_coeff,
                               np.zeros((cabs.shape[0] - nao, mol.nao))]),
                    cabs])
    ix = np.ix_(perm, perm, perm, perm)
    Rb = mp2f12.stg_eri(big, zeta)[ix]
    Vb = native.eri4c(big)[ix]
    tb = gto.intor_ovlp_kin(big)[1][np.ix_(perm, perm)]
    vb = gto.intor_nuc(big)[np.ix_(perm, perm)]
    dm = 2 * mf.mo_coeff[:, :nocc] @ mf.mo_coeff[:, :nocc].T
    J = np.einsum("pqrs,rs->pq", Vb[:, :, :nao, :nao], dm, optimize=True)
    K = np.einsum("prqs,rs->pq", Vb[:, :nao, :, :nao], dm, optimize=True)
    Fmo = Pc.T @ (tb + vb + J - 0.5 * K) @ Pc
    eps_i = Fmo[0, 0]
    ci = np.vstack([mf.mo_coeff[:, :1],
                    np.zeros((Pc.shape[0] - nao, 1))])
    fPi = np.einsum("pqrs,pP,q,rR,s->PR", Rb, Pc, ci[:, 0], Pc, ci[:, 0],
                    optimize=True)
    gPi = np.einsum("pqrs,pP,q,rR,s->PR", Vb, Pc, ci[:, 0], Pc, ci[:, 0],
                    optimize=True)
    nmo = mol.nao
    w = fPi.copy()
    w[:nmo, :nmo] = 0.0
    w[:nocc, nmo:] = 0.0
    w[nmo:, :nocc] = 0.0
    t = -0.5 / zeta
    Fw = Fmo @ w + w @ Fmo.T
    e_B_brute = t * t * (np.sum(w * Fw) - 2 * eps_i * np.sum(w * w))

    # isolate energy_f12's quadratic (B/X) piece by subtracting its
    # exact-integral V contribution, recomputed here independently
    Y = mp2f12._trans(mp2f12.stg_eri(mol, zeta, coulomb=True),
                      [mf.mo_coeff[:, :nocc]] * 4)[0, 0, 0, 0]
    # RI projections of V restricted to He's single pair: all obs pairs
    # + occ x cabs channels == the SAME mask as w, applied to fPi vs gPi
    proj = fPi - w                       # in-space part of f|ii>
    V_0000 = float(Y - np.sum(proj * gPi))
    e_f12 = mp2f12.energy_f12(mf, aux, zeta=zeta)
    e_quad = e_f12 - 2 * t * V_0000
    assert abs(e_quad - e_B_brute) < 1e-9


def test_h2_f12_hits_cbs_limit():
    atom = "H 0 0 0; H 0 0 0.7414"
    mol = gto.M(atom=atom, basis="cc-pvdz", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    import jax.numpy as jnp
    from pyscf_mpcc_tpu import ao2mo
    from pyscf_mpcc_tpu.mp import mp2
    co = mf.mo_coeff[:, :1]
    cv = mf.mo_coeff[:, 1:]
    ovov = ao2mo.general(jnp.asarray(gto.intor_eri(mol)),
                         (co, cv, co, cv))
    e_dz = float(mp2.kernel(jnp.asarray(mf.mo_energy[:1]),
                            jnp.asarray(mf.mo_energy[1:]), ovov)[0])
    aux = gto.M(atom=atom, basis="cc-pvdz-f12-optri", unit="angstrom")
    ef12 = mp2f12.energy_f12(mf, aux, zeta=1.1)
    assert ef12 < 0
    # H2 MP2 CBS limit ~ -0.0340; DZ gives -0.0264; F12/DZ must land
    # within ~2 mHa of the limit
    assert -0.0375 < e_dz + ef12 < -0.0320


@pytest.mark.skipif(not os.environ.get("PYSCF_MPCC_TPU_SLOW_TESTS"),
                    reason="slow (several minutes)")
def test_h2o_frozen_core_f12_beats_tz():
    atom = ("O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692")
    mol = gto.M(atom=atom, basis="cc-pvdz", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    aux = gto.M(atom=atom, basis="cc-pvdz-f12-optri", unit="angstrom")
    ef12 = mp2f12.energy_f12(mf, aux, zeta=1.1, frozen=1)
    # fc-MP2: DZ -0.2017, TZ -0.2615, CBS ~ -0.300; F12/DZ must recover
    # more correlation than TZ without absurd overshoot
    assert -0.32 < -0.2017 + ef12 < -0.2615

def test_be_multipair_b_x_v_match_bruteforce():
    """Multi-pair contract: on Be (two occupied orbitals, three distinct
    geminal pairs incl. the off-diagonal (1s,2s) coupling) the V/B/X
    occupied-index matrices from energy_f12's mixed MO+CABS construction
    must match an INDEPENDENT one: Loewdin orthonormalization of the
    full merged basis + the SP projector Q12 = 1 - O1O2 - o1(1-O2) -
    (1-O1)o2 applied as explicit projection matrices.  The matrices are
    basis-independent within the extended span, so agreement is exact
    (fork capability: mp2f12_slow multi-pair B assembly, here validated
    where upstream's is untested)."""
    import scipy.linalg
    zeta = 1.0
    mol = gto.M(atom="Be 0 0 0", basis="cc-pvdz", spin=0)
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    cab = []
    for l, n in ((0, 5), (1, 4), (2, 3)):
        for k in range(n):
            cab.append([l, [0.12 * 2.6 ** k, 1.0]])
    aux = gto.M(atom="Be 0 0 0", basis={"Be": cab}, spin=0)
    nocc, nao = mol.nelectron // 2, mol.nao
    mo = np.asarray(mf.mo_coeff)

    _, mats = mp2f12.energy_f12(mf, aux, zeta=zeta, return_matrices=True)

    big, perm = mp2f12.conc_mol(mol, aux)
    s_all, t_all = gto.intor_ovlp_kin(big)
    s = s_all[np.ix_(perm, perm)]
    tb = t_all[np.ix_(perm, perm)]
    vb = gto.intor_nuc(big)[np.ix_(perm, perm)]
    w_s, v_s = scipy.linalg.eigh(s)
    # well-conditioned merged basis: both constructions keep the full
    # span, so they must agree exactly (no lindep-cut ambiguity)
    assert w_s.min() > 1e-7
    C = v_s / np.sqrt(w_s)
    nbig = C.shape[1]

    mo_big = np.vstack([mo, np.zeros((s.shape[0] - nao, mo.shape[1]))])
    x = C.T @ s @ mo_big
    O = x @ x.T
    o = x[:, :nocc] @ x[:, :nocc].T

    v_ao = native.eri4c(big)[np.ix_(perm, perm, perm, perm)]
    dm = 2.0 * mo[:, :nocc] @ mo[:, :nocc].T
    F_ao = tb + vb
    F_ao = F_ao + np.einsum("pqij,ji->pq", v_ao[:, :, :nao, :nao], dm,
                            optimize=True)
    F_ao = F_ao - 0.5 * np.einsum("pijq,ij->pq", v_ao[:, :nao, :nao, :],
                                  dm, optimize=True)
    F = C.T @ F_ao @ C

    R_ao = mp2f12.stg_eri(big, zeta)[np.ix_(perm, perm, perm, perm)]
    ci = mo_big[:, :nocc]
    G = np.einsum("pqrs,pA,qi,rB,sj->AiBj", R_ao, C, ci, C, ci,
                  optimize=True)
    g = np.einsum("pqrs,pA,qi,rB,sj->AiBj", v_ao, C, ci, C, ci,
                  optimize=True)
    I = np.eye(nbig)
    proj = (np.einsum("AC,BD,CiDj->AiBj", O, O, G, optimize=True)
            + np.einsum("AC,BD,CiDj->AiBj", o, I - O, G, optimize=True)
            + np.einsum("AC,BD,CiDj->AiBj", I - O, o, G, optimize=True))
    W = G - proj

    Y = mp2f12._trans(mp2f12.stg_eri(mol, zeta, coulomb=True),
                      [mo[:, :nocc]] * 4)
    V_brute = Y - np.einsum("AmBn,AiBj->minj", proj, g, optimize=True)
    X_brute = np.einsum("AmBn,AiBj->minj", W, W, optimize=True)
    FW = (np.einsum("AC,CiBj->AiBj", F, W, optimize=True)
          + np.einsum("BC,AiCj->AiBj", F, W, optimize=True))
    B_brute = np.einsum("AmBn,AiBj->minj", W, FW, optimize=True)

    assert np.abs(np.asarray(mats["V"]) - V_brute).max() < 1e-10
    assert np.abs(np.asarray(mats["X"]) - X_brute).max() < 1e-10
    assert np.abs(np.asarray(mats["B"]) - B_brute).max() < 1e-10
