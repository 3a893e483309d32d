"""Generalized-kernel 4c integrals (gto/native kern_fvals).

Validation ladder:
  * s-type fundamentals against the closed forms for all kernels,
  * p/d blocks against center-derivatives of the s closed forms
    (x e^{-ar^2} = (1/2a) d/dAx e^{-ar^2}) — exercises the m=1,2
    derivative ladder of each kernel,
  * damped Coulomb at gamma->0 == the (independently validated)
    Coulomb tensor; Gaussian geminal at gamma->0 == S x S,
  * r^2-Gaussian kernel == -d/dgamma of the Gaussian geminal (FD).
"""

import numpy as np
import pytest
from scipy.special import erf

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.gto import native
from pyscf_mpcc_tpu.gto.mole import gto_norm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native engine")

A_, B_, C_, D_ = 1.3, 0.7, 2.1, 0.4
COORDS = np.array([[0, 0, 0], [0.5, 0.3, 0.9],
                   [-0.4, 1.1, 0.2], [0.8, -0.6, 0.5]])
ATOM = "H 0 0 0; He 0.5 0.3 0.9; Li -0.4 1.1 0.2; Be 0.8 -0.6 0.5"


def _F0(x):
    return (0.5 * np.sqrt(np.pi / x) * erf(np.sqrt(x)) if x > 1e-12
            else 1.0 - x / 3 + x * x / 10)


def ss_fund_raw(a, A, b, B, c, C, d, D, kern, gamma):
    """(ss|f|ss) over unnormalized primitives, closed forms."""
    A, B, C, D = map(np.asarray, (A, B, C, D))
    p, q = a + b, c + d
    P = (a * A + b * B) / p
    Q = (c * C + d * D) / q
    Kab = np.exp(-a * b / p * np.sum((A - B) ** 2))
    Kcd = np.exp(-c * d / q * np.sum((C - D) ** 2))
    rho = p * q / (p + q)
    T = rho * np.sum((P - Q) ** 2)
    if kern == native.KERN_COULOMB:
        pref, th = 2 * np.pi ** 2.5 / (p * q * np.sqrt(p + q)), _F0(T)
    elif kern == native.KERN_GAUSS:
        pref = np.pi ** 3 / ((p + q) * (rho + gamma)) ** 1.5
        th = np.exp(-gamma / (rho + gamma) * T)
    elif kern == native.KERN_GAUSS_R2:
        pref = np.pi ** 3 / ((p + q) * (rho + gamma)) ** 1.5
        rg = rho + gamma
        th = np.exp(-gamma / rg * T) * (1.5 / rg + T * rho / rg ** 2)
    else:
        pref = 2 * np.pi ** 2.5 / ((p + q) ** 1.5 * (rho + gamma))
        th = np.exp(-gamma / (rho + gamma) * T) * _F0(
            rho / (rho + gamma) * T)
    return Kab * Kcd * pref * th


def _Ns(e):
    return gto_norm(0, e) / np.sqrt(4 * np.pi)


def _mol(l0=0):
    basis = {"H": [[l0, [A_, 1.0]]], "He": [[0, [B_, 1.0]]],
             "Li": [[0, [C_, 1.0]]], "Be": [[0, [D_, 1.0]]]}
    return gto.M(atom=ATOM, basis=basis, unit="bohr", spin=0)


@pytest.mark.parametrize("kern,gamma", [
    (native.KERN_COULOMB, 0.0), (native.KERN_GAUSS, 0.9),
    (native.KERN_GAUSS, 3.7), (native.KERN_GAUSS_COULOMB, 0.9),
    (native.KERN_GAUSS_COULOMB, 3.7), (native.KERN_GAUSS_R2, 1.3)])
def test_s_fundamentals_closed_form(kern, gamma):
    mol = _mol()
    eri = native.eri4c_kern(mol, kern, gamma)
    NN = _Ns(A_) * _Ns(B_) * _Ns(C_) * _Ns(D_)
    ref = NN * ss_fund_raw(A_, COORDS[0], B_, COORDS[1], C_, COORDS[2],
                           D_, COORDS[3], kern, gamma)
    assert abs(eri[0, 1, 2, 3] - ref) < 1e-13 * max(abs(ref), 1.0)


@pytest.mark.parametrize("kern,gamma", [
    (native.KERN_GAUSS, 1.7), (native.KERN_GAUSS_COULOMB, 1.7),
    (native.KERN_GAUSS_R2, 1.7)])
def test_p_block_center_derivative(kern, gamma):
    mol = _mol(l0=1)
    eri = native.eri4c_kern(mol, kern, gamma)
    h = 2e-5

    def f(dx):
        return ss_fund_raw(A_, COORDS[0] + np.array([dx, 0, 0]), B_,
                           COORDS[1], C_, COORDS[2], D_, COORDS[3],
                           kern, gamma)

    Npx = gto_norm(1, A_) * np.sqrt(3 / (4 * np.pi))
    ref = (Npx * _Ns(B_) * _Ns(C_) * _Ns(D_) / (2 * A_)
           * (f(h) - f(-h)) / (2 * h))
    # px is the first spherical p component in this engine's ordering
    assert abs(eri[0, 3, 4, 5] - ref) < 1e-7 * max(abs(ref), 1e-3)


@pytest.mark.parametrize("kern,gamma", [
    (native.KERN_GAUSS, 1.7), (native.KERN_GAUSS_COULOMB, 0.37)])
def test_d_block_second_derivative(kern, gamma):
    mol = _mol(l0=2)
    eri = native.eri4c_kern(mol, kern, gamma)
    h = 3e-4

    def f(dx, dy):
        return ss_fund_raw(A_, COORDS[0] + np.array([dx, dy, 0]), B_,
                           COORDS[1], C_, COORDS[2], D_, COORDS[3],
                           kern, gamma)

    d2 = (f(h, h) - f(h, -h) - f(-h, h) + f(-h, -h)) / (4 * h * h)
    Nd = gto_norm(2, A_) * np.sqrt(15 / (4 * np.pi))
    ref = Nd * _Ns(B_) * _Ns(C_) * _Ns(D_) / (4 * A_ * A_) * d2
    assert abs(eri[0, 5, 6, 7] - ref) < 1e-5 * max(abs(ref), 1e-4)


def test_damped_coulomb_gamma0_is_coulomb():
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    ref = native.eri4c(mol)
    got = native.eri4c_kern(mol, native.KERN_GAUSS_COULOMB, 1e-14)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_gauss_gamma0_is_overlap_product():
    mol = gto.M(atom="H 0 0 0; H 0 0 0.9", basis="sto-3g",
                unit="angstrom", spin=0)
    S, _ = gto.intor_ovlp_kin(mol)
    got = native.eri4c_kern(mol, native.KERN_GAUSS, 1e-12)
    ref = np.einsum("pq,rs->pqrs", S, S)
    np.testing.assert_allclose(got, ref, atol=1e-8)


def test_r2_kernel_is_gamma_derivative():
    mol = _mol()
    g = 1.1
    h = 1e-5
    d = (native.eri4c_kern(mol, native.KERN_GAUSS, g + h)
         - native.eri4c_kern(mol, native.KERN_GAUSS, g - h)) / (2 * h)
    got = native.eri4c_kern(mol, native.KERN_GAUSS_R2, g)
    np.testing.assert_allclose(got, -d, atol=1e-8)
