"""Segmented Lambda vjp == monolithic vjp.

The production Lambda step (lambda_ad._lambda_step) computes the jtvp
lambda^T dR/dt segment-by-segment (rccsd.residual_segments) so the
backward fits HBM at (H2O)8 scale.  These tests pin the decomposition to
the monolithic path exactly:

  (a) sum of segments + constant + diagonal == residual()   (fp64, 1e-11)
  (b) the segmented step's lambda-equation residual == the one computed
      with a single jax.vjp over the full residual           (fp64, 1e-10)
  (c) same with frozen-block masks (the MP-CC fragment Lambda path)
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import eris as eris_mod, lambda_ad, rccsd
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz


def _setup(df):
    d = h2o_ccpvdz()
    nocc = 5
    if df:
        # exact "DF" factors via eigendecomposition (the ERI tensor is PSD)
        nao = d["eri_ao"].shape[0]
        w, v = np.linalg.eigh(d["eri_ao"].reshape(nao * nao, nao * nao))
        keep = w > 1e-12
        B = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
        er = eris_mod.make_eris_df(B, d["mo_coeff"], d["fock_ao"], nocc)
    else:
        er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                       d["fock_ao"], nocc)
    conv, _, t1, t2 = rccsd.kernel(er, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100)
    assert conv
    return er, t1, t2


def _mono_res(l1, l2, t1, t2, er, ntile=1, m1=None, m2=None):
    """Lambda-equation residual via ONE vjp over the full residual."""
    de1, de2 = jax.grad(lambda a, b: rccsd.energy(a, b, er),
                        argnums=(0, 1))(t1, t2)
    _, vjp = jax.vjp(
        lambda a, b: lambda_ad.residual(a, b, er, ntile=ntile, m1=m1, m2=m2),
        t1, t2)
    j1, j2 = vjp((l1, l2))
    res1 = de1 + j1
    res2 = de2 + j2
    res2 = 0.5 * (res2 + res2.transpose(1, 0, 3, 2))
    if m1 is not None:
        res1 = jnp.where(m1, 0.0, res1)
        res2 = jnp.where(m2, 0.0, res2)
    return res1, res2


def test_segment_sum_matches_residual_incore():
    er, t1, t2 = _setup(df=False)
    r1a, r2a = lambda_ad.residual(t1, t2, er)
    r1b, r2b = rccsd.residual_from_segments(t1, t2, er)
    assert float(jnp.abs(r1a - r1b).max()) < 1e-11
    assert float(jnp.abs(r2a - r2b).max()) < 1e-11


def test_segment_sum_matches_residual_df():
    er, t1, t2 = _setup(df=True)
    # off the fixed point too: perturbed amplitudes
    key = jax.random.PRNGKey(0)
    t1p = t1 + 1e-3 * jax.random.normal(key, t1.shape, t1.dtype)
    t2p = t2 + 1e-3 * jax.random.normal(key, t2.shape, t2.dtype)
    t2p = 0.5 * (t2p + t2p.transpose(1, 0, 3, 2))
    r1a, r2a = lambda_ad.residual(t1p, t2p, er, ntile=19)
    r1b, r2b = rccsd.residual_from_segments(t1p, t2p, er, ntile=19)
    assert float(jnp.abs(r1a - r1b).max()) < 1e-11
    assert float(jnp.abs(r2a - r2b).max()) < 1e-11


def test_segmented_step_matches_monolithic():
    er, t1, t2 = _setup(df=True)
    key = jax.random.PRNGKey(1)
    l1 = t1 + 1e-2 * jax.random.normal(key, t1.shape, t1.dtype)
    l2 = t2 + 1e-2 * jax.random.normal(key, t2.shape, t2.dtype)
    l2 = 0.5 * (l2 + l2.transpose(1, 0, 3, 2))
    # _lambda_step donates l buffers — hand it copies
    _, _, res1s, res2s, _ = lambda_ad._lambda_step(
        jnp.array(l1), jnp.array(l2), t1, t2, er, ntile=19)
    res1m, res2m = _mono_res(l1, l2, t1, t2, er, ntile=19)
    scale = float(jnp.abs(res2m).max()) + 1.0
    assert float(jnp.abs(res1s - res1m).max()) / scale < 1e-10
    assert float(jnp.abs(res2s - res2m).max()) / scale < 1e-10


def test_segmented_step_matches_monolithic_masked():
    er, t1, t2 = _setup(df=False)
    nocc, nvir = t1.shape
    m1 = np.zeros((nocc, nvir), bool)
    m1[:2] = True                      # freeze 2 core-ish holes
    m2 = np.zeros((nocc, nocc, nvir, nvir), bool)
    m2[:2, :2] = True
    m1 = jnp.asarray(m1)
    m2 = jnp.asarray(m2)
    key = jax.random.PRNGKey(2)
    l1 = t1 + 1e-2 * jax.random.normal(key, t1.shape, t1.dtype)
    l2 = t2 + 1e-2 * jax.random.normal(key, t2.shape, t2.dtype)
    l2 = 0.5 * (l2 + l2.transpose(1, 0, 3, 2))
    _, _, res1s, res2s, _ = lambda_ad._lambda_step(
        jnp.array(l1), jnp.array(l2), t1, t2, er, m1=m1, m2=m2)
    res1m, res2m = _mono_res(l1, l2, t1, t2, er, m1=m1, m2=m2)
    scale = float(jnp.abs(res2m).max()) + 1.0
    assert float(jnp.abs(res1s - res1m).max()) / scale < 1e-10
    assert float(jnp.abs(res2s - res2m).max()) / scale < 1e-10
