import jax.numpy as jnp
import numpy as np
import scipy.linalg

from pyscf_mpcc_tpu.cc import eris as eris_mod
from pyscf_mpcc_tpu.cc import rccsd
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

# pyscf/cc/test/test_h2o.py:53-77 pinned values
E_MP2 = -0.2040199672883385
E_CCSD = -0.2133432312951


def _eris():
    d = h2o_ccpvdz()
    return eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                     d["fock_ao"], 5)


def test_per_iteration_pinned_values():
    er = _eris()
    emp2, t1, t2 = rccsd.init_amps(er)
    assert abs(float(emp2) - E_MP2) < 1e-9
    assert abs(float(jnp.abs(t2).sum()) - 4.9556571211255909) < 1e-5
    t1, t2 = rccsd.update_amps(t1, t2, er)
    assert abs(float(jnp.abs(t1).sum()) - 0.0475038989126) < 1e-6
    assert abs(float(jnp.abs(t2).sum()) - 5.4018238455030) < 1e-5
    assert abs(float(rccsd.energy(t1, t2, er)) - -0.208967840546667) < 1e-9
    t1, t2 = rccsd.update_amps(t1, t2, er)
    assert abs(float(rccsd.energy(t1, t2, er)) - -0.212173678670510) < 1e-9


def test_converged_energy():
    er = _eris()
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100)
    assert conv
    assert abs(e - E_CCSD) < 1e-7
    # t2 permutational symmetry
    assert float(jnp.abs(t2 - t2.transpose(1, 0, 3, 2)).max()) < 1e-10


def test_df_ladder_matches_full_ladder():
    """Cholesky-factorize the exact ERI so the DF path must agree with the
    materialized-vvvv path to machine precision (validates the tiled
    lax.map ladder and the t1-dressing compensation)."""
    d = h2o_ccpvdz()
    nocc = 5
    nao = d["eri_ao"].shape[0]
    eri_mat = d["eri_ao"].reshape(nao * nao, nao * nao)
    # exact "DF" factors via pivoted Cholesky (ERI is PSD)
    w, v = np.linalg.eigh(eri_mat)
    keep = w > 1e-12
    B = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
    er_full = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                        d["fock_ao"], nocc)
    er_df = eris_mod.make_eris_df(B, d["mo_coeff"], d["fock_ao"], nocc)
    _, t1, t2 = rccsd.init_amps(er_full)
    a1, a2 = rccsd.update_amps(t1, t2, er_full)
    for ntile in (1, 19):  # nvir = 19
        b1, b2 = rccsd.update_amps(t1, t2, er_df, ntile=ntile)
        assert float(jnp.abs(a1 - b1).max()) < 1e-9
        assert float(jnp.abs(a2 - b2).max()) < 1e-9
    # ovvv-free production path: every ovvv contraction factorized through L
    er_direct = eris_mod.make_eris_df(B, d["mo_coeff"], d["fock_ao"], nocc,
                                      keep_ovvv=False)
    c1, c2 = rccsd.update_amps(t1, t2, er_direct, ntile=1)
    assert float(jnp.abs(a1 - c1).max()) < 1e-9
    assert float(jnp.abs(a2 - c2).max()) < 1e-9


def test_device_diis_matches_host():
    """The on-device DIIS ring buffer converges to the same fixed point."""
    er = _eris()
    conv_h, e_h, *_ = rccsd.kernel(er, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100)
    conv_d, e_d, *_ = rccsd.kernel(er, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100, diis_backend="device")
    assert conv_h and conv_d
    assert abs(e_h - e_d) < 1e-8


def test_device_diis_fp32_converges_tight():
    """fp32 device ring must reach the production tolerances.

    Regression for the host-solve hybrid (lib/device_diis.update_hostsolve):
    the fully-on-device fp32 eigendecomposition of the DIIS B matrix runs
    out of precision and stalls the solve at |dt| ~ 1e-5 (measured at
    benzene/cc-pVTZ on the chip: 60 cycles unconverged where the host ring
    reaches 1e-6).  With the tiny B system solved on the host in fp64 the
    device ring matches the host ring's convergence envelope while
    amplitude-sized data stays on device."""
    d = h2o_ccpvdz()
    nao = d["eri_ao"].shape[0]
    eri_mat = d["eri_ao"].reshape(nao * nao, nao * nao)
    w, v = np.linalg.eigh(eri_mat)
    keep = w > 1e-12
    B = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
    er32 = eris_mod.make_eris_df(B, d["mo_coeff"], d["fock_ao"], 5,
                                 dtype=jnp.float32, keep_ovvv=False)
    conv_h, e_h, *_ = rccsd.kernel(er32, conv_tol=1e-8, conv_tol_normt=1e-6,
                                   max_cycle=80)
    conv_d, e_d, *_ = rccsd.kernel(er32, conv_tol=1e-8, conv_tol_normt=1e-6,
                                   max_cycle=80, diis_backend="device")
    assert conv_h, "host-ring fp32 baseline must converge"
    assert conv_d, "fp32 device ring stalled below the production tolerance"
    assert abs(e_h - e_d) < 5e-7
    assert abs(e_d - E_CCSD) < 5e-5  # fp32 solve of the exact-factor DF
