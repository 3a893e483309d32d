"""Single-chip out-of-core (host-streamed Lvv) parity tests.

The streamed mode (cc/stream_ladder + lib/hoststore, wired through
eris.make_eris_df(stream_vv=True)) is the TPU-native counterpart of the
reference's HDF5 out-of-core eris (pyscf/cc/ccsd.py:1611
_make_eris_outcore + dfccsd.py blocked loops): the (naux, nvir, nvir)
Lvv factor stays in host RAM and jitted code pulls row tiles through
io_callback.  These tests pin the streamed solve — forward CCSD, the
hand-derived ladder vjp, and the full Lambda solve (AD through the
streamed ovvv ops + custom-vjp ladder) — against the device-resident
DF path bit-for-bit-same-inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import eris as eris_mod
from pyscf_mpcc_tpu.cc import lambda_ad, rccsd
from pyscf_mpcc_tpu.df import df as df_mod
from pyscf_mpcc_tpu.lib import hoststore
from pyscf_mpcc_tpu.scf import RHF


@pytest.fixture(scope="module")
def h2o_df():
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="cc-pvdz", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    B = np.asarray(df_mod.DF(mol).B_ao())
    fock_ao = np.asarray(mf.get_fock(mf.make_rdm1()))
    mo = np.asarray(mf.mo_coeff)
    return B, mo, fock_ao, mol.nelectron // 2


def _both_eris(h2o_df):
    B, mo, fock_ao, nocc = h2o_df
    er_res = eris_mod.make_eris_df(B, mo, fock_ao, nocc, keep_ovvv=False)
    er_str = eris_mod.make_eris_df(B, mo, fock_ao, nocc, stream_vv=True)
    return er_res, er_str


def test_streamed_eris_layout(h2o_df):
    er_res, er_str = _both_eris(h2o_df)
    assert er_str.Lvv is None and er_str.ovvv is None
    assert er_str.Lvv_stream is not None
    lvv_host = hoststore.get(int(er_str.Lvv_stream))
    np.testing.assert_allclose(lvv_host, np.asarray(er_res.Lvv),
                               rtol=0, atol=0)
    assert hoststore.nbytes() >= lvv_host.nbytes
    # the o^2v^2-class blocks are identical
    np.testing.assert_allclose(np.asarray(er_str.oovv),
                               np.asarray(er_res.oovv), atol=1e-12)


@pytest.mark.parametrize("ntile", [1, 3])
def test_streamed_ladder_forward_and_vjp(h2o_df, ntile):
    """The streamed pp ladder (custom_vjp) == resident pair_ladder_sym,
    value AND cotangents (dtau, dt1)."""
    er_res, er_str = _both_eris(h2o_df)
    nocc, nvir = er_res.nocc, er_res.nvir
    rng = np.random.default_rng(3)
    tau = jnp.asarray(rng.standard_normal((nocc, nocc, nvir, nvir)))
    tau = 0.5 * (tau + tau.transpose(1, 0, 3, 2))
    t1 = jnp.asarray(rng.standard_normal((nocc, nvir)) * 0.1)
    w = jnp.asarray(rng.standard_normal(tau.shape))

    def f_res(tau, t1):
        ld = er_res.Lvv - jnp.einsum("ka,Lkc->Lac", t1, er_res.Lov)
        return jnp.vdot(w, rccsd.pair_ladder_sym(tau, ld, ntile))

    from pyscf_mpcc_tpu.cc import stream_ladder
    ladder = stream_ladder.make_streamed_ladder(
        nocc, nvir, er_str.Lov.shape[0], ntile, er_str.Lov.dtype)

    def f_str(tau, t1):
        return jnp.vdot(w, ladder(tau, t1, er_str.Lov,
                                  er_str.Lvv_stream))

    v_res, g_res = jax.value_and_grad(f_res, argnums=(0, 1))(tau, t1)
    v_str, g_str = jax.value_and_grad(f_str, argnums=(0, 1))(tau, t1)
    np.testing.assert_allclose(float(v_str), float(v_res), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_str[0]), np.asarray(g_res[0]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g_str[1]), np.asarray(g_res[1]),
                               rtol=1e-9, atol=1e-10)


def test_streamed_ovvv_ops_match_resident(h2o_df):
    er_res, er_str = _both_eris(h2o_df)
    nocc, nvir = er_res.nocc, er_res.nvir
    rng = np.random.default_rng(5)
    t1 = jnp.asarray(rng.standard_normal((nocc, nvir)) * 0.1)
    t2 = jnp.asarray(rng.standard_normal((nocc, nocc, nvir, nvir)) * 0.1)
    ops_r = rccsd._OvvvOps(er_res)
    ops_s = rccsd._OvvvOps(er_str, ntile=3)
    for name, args in (("t1_t2_terms", (t2,)), ("lvv_t1", (t1,)),
                       ("wvoov_t1", (t1,)), ("wvovo_t1", (t1,)),
                       ("t2_vvov_t1", (t1,))):
        a = np.asarray(getattr(ops_r, name)(*args))
        b = np.asarray(getattr(ops_s, name)(*args))
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11,
                                   err_msg=name)


def test_streamed_ccsd_and_lambda_match_resident(h2o_df):
    """End to end: full CCSD solve + Lambda solve in streamed mode agree
    with the resident DF path (identical factors, identical equations)."""
    er_res, er_str = _both_eris(h2o_df)
    kw = dict(conv_tol=1e-10, conv_tol_normt=1e-8, max_cycle=80, ntile=2)
    cr, e_r, t1r, t2r = rccsd.kernel(er_res, **kw)
    cs, e_s, t1s, t2s = rccsd.kernel(er_str, **kw)
    assert cr and cs
    assert abs(float(e_r) - float(e_s)) < 1e-9
    assert float(jnp.abs(t2r - t2s).max()) < 1e-8

    clr, l1r, l2r = lambda_ad.kernel(t1r, t2r, er_res, conv_tol=1e-8,
                                     max_cycle=60, ntile=2)
    cls_, l1s, l2s = lambda_ad.kernel(t1s, t2s, er_str, conv_tol=1e-8,
                                      max_cycle=60, ntile=2)
    assert clr and cls_
    assert float(jnp.abs(l1r - l1s).max()) < 1e-7
    assert float(jnp.abs(l2r - l2s).max()) < 1e-7
