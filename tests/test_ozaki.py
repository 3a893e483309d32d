"""Ozaki-scheme fp64-grade dots on the int8 MXU path (ops/ozaki.py).

On the CPU test backend the same int8 dot_general + two-float combine
runs bit-identically to the TPU path (exact integer arithmetic both
ways), so these tests pin the full numeric contract; the chip adds only
throughput (457 TOP/s int8, tools/device_prec_probe.py).
"""

import numpy as np
import pytest

from pyscf_mpcc_tpu.ops import ozaki


def test_matmul64_accuracy():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((64, 128)) * np.exp(rng.standard_normal((64, 1)) * 3)
    B = rng.standard_normal((128, 96)) * np.exp(rng.standard_normal((1, 96)) * 3)
    ref = A @ B
    scale = np.abs(ref).max()
    assert np.abs(ozaki.matmul64(A, B, s=6) - ref).max() / scale < 5e-12
    assert np.abs(ozaki.matmul64(A, B, s=8) - ref).max() / scale < 1e-13


def test_matmul64_long_contraction_chunks():
    rng = np.random.default_rng(1)
    k = ozaki._MAX_EXACT_K + 1000   # forces the exact-accumulation chunking
    A = rng.standard_normal((4, k))
    B = rng.standard_normal((k, 5))
    ref = A @ B
    got = ozaki.matmul64(A, B, s=8)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_split_digits_exact_reconstruction():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((8, 16)) * 10.0 ** rng.integers(-6, 6, (8, 1))
    d, e = ozaki.split_digits(A, 8, axis=1)
    rec = np.zeros_like(A)
    shift = ozaki._B0
    for t in range(8):
        rec += np.ldexp(d[t].astype(np.float64), -shift)
        shift += ozaki._BD
    rec = np.ldexp(rec, e[:, None])
    assert np.abs(rec - A).max() / np.abs(A).max() < 1e-16


def test_ladder_dot64_matches_dense_einsum():
    import jax
    rng = np.random.default_rng(3)
    o, v, naux = 6, 18, 40
    l2 = rng.standard_normal((o, o, v, v)) * 1e-2
    l2 = 0.5 * (l2 + l2.transpose(1, 0, 3, 2))
    tau = rng.standard_normal((o, o, v, v)) * 1e-2
    tau = 0.5 * (tau + tau.transpose(1, 0, 3, 2))
    Ld = rng.standard_normal((naux, v, v))
    W = np.einsum("Lac,Lbd->acbd", Ld, Ld)
    ref = np.einsum("ijab,acbd,ijcd->", l2, W, tau)
    for ntile, s, tol in ((1, 6, 3e-9), (3, 6, 3e-9), (4, 8, 1e-9)):
        got = ozaki.ladder_dot64(l2, tau, Ld, ntile=ntile, s=s)
        assert abs(got - ref) / abs(ref) < tol, (ntile, s, got, ref)


def test_lagrangian_ozaki_backend_matches_host():
    """lagrangian_energy(ladder_backend='ozaki') == the all-host fp64
    evaluation to certification precision (H2O/cc-pVDZ DF)."""
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.cc import eris as eris_mod, lambda_ad, rccsd
    from pyscf_mpcc_tpu.scf import RHF

    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                "H 0 -0.7572 -0.4692", basis="cc-pvdz")
    mf = RHF(mol).density_fit()
    mf.conv_tol = 1e-11
    mf.with_df.build()
    mf.kernel()
    B = np.asarray(mf.with_df.B_ao())
    fock = np.asarray(mf.get_fock(mf.make_rdm1()))
    nocc = mol.nelectron // 2
    er = eris_mod.make_eris_df(B, np.asarray(mf.mo_coeff), fock, nocc,
                               keep_ovvv=False)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-10, conv_tol_normt=1e-8)
    assert conv
    cl, l1, l2 = lambda_ad.kernel(t1, t2, er, conv_tol=1e-7)
    assert cl
    el_plain = float(lambda_ad.lagrangian_energy(t1, t2, l1, l2, er))
    el_oz = lambda_ad.lagrangian_energy(t1, t2, l1, l2, er,
                                        ladder_backend="ozaki",
                                        oz_ntile=3, oz_s=6)
    assert abs(el_oz - el_plain) < 3e-9
