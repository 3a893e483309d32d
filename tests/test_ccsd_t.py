import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import ccsd_t, eris as eris_mod, rccsd
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

# pyscf/cc/ccsd_t.py:255 (distorted H2O geometry, cc-pVDZ)
E_T_REF = -0.0033300722704016289


def _converged(geom="tilt"):
    d = h2o_ccpvdz(geom=geom)
    er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                   d["fock_ao"], 5)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-12, conv_tol_normt=1e-10,
                                   max_cycle=200)
    assert conv
    return d, er, t1, t2


def test_ccsd_t_pinned():
    d, er, t1, t2 = _converged()
    et = ccsd_t.kernel(t1, t2, er, tile=8)
    assert abs(et - E_T_REF) < 1e-10


def test_ccsd_t_tile_invariance():
    d, er, t1, t2 = _converged()
    e8 = ccsd_t.kernel(t1, t2, er, tile=8)
    e5 = ccsd_t.kernel(t1, t2, er, tile=5)
    e19 = ccsd_t.kernel(t1, t2, er, tile=19)  # no padding
    assert abs(e8 - e5) < 1e-12
    assert abs(e8 - e19) < 1e-12


def test_ccsd_t_df_factors_match_full():
    """(T) evaluated from exact Cholesky 'DF' factors must reproduce the
    materialized-ovvv result (validates the on-the-fly (ix|fy) blocks)."""
    d, er, t1, t2 = _converged()
    nao = d["eri_ao"].shape[0]
    w, v = np.linalg.eigh(d["eri_ao"].reshape(nao * nao, nao * nao))
    keep = w > 1e-12
    B = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
    er_df = eris_mod.make_eris_df(B, d["mo_coeff"], d["fock_ao"], 5,
                                  keep_ovvv=False)
    et_full = ccsd_t.kernel(t1, t2, er, tile=8)
    et_df = ccsd_t.kernel(t1, t2, er_df, tile=8)
    assert abs(et_full - et_df) < 1e-10
