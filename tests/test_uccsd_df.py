"""DF-direct UCCSD: exact-Cholesky factors must reproduce the materialized
update to machine precision (validates the t1-dressed tiled ladders with
quadratic compensation and the factorized ovvv/vvvo contractions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import uccsd
from pyscf_mpcc_tpu.scf import RHF, UHF


def _chol(eri):
    nao = eri.shape[0]
    w, v = np.linalg.eigh(eri.reshape(nao * nao, nao * nao))
    keep = w > 1e-12
    return (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)


def _focks(mf):
    dm = mf.make_rdm1()
    if np.asarray(dm).ndim == 2:
        f = mf.get_fock(dm)
        return f, f, mf.mo_coeff, mf.mo_coeff
    j, k = mf.get_jk(dm)
    h = mf.get_hcore()
    return (h + j[0] + j[1] - k[0], h + j[0] + j[1] - k[1],
            mf.mo_coeff[0], mf.mo_coeff[1])


@pytest.mark.parametrize("case", ["rhf", "uhf"])
def test_df_update_matches_materialized(case):
    if case == "rhf":
        mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                          [1, (0, 0.757, 0.587)]], basis="sto-3g")
        mf = RHF(mol)
    else:
        mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
        mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    eri = gto.intor_eri(mol)
    B = _chol(eri)
    fa, fb, moa, mob = _focks(mf)
    na, nb = mol.nelec
    ue = uccsd.make_eris_incore(eri, moa, mob, fa, fb, na, nb)
    ud = uccsd.make_eris_df(B, moa, mob, fa, fb, na, nb)
    _, t1, t2 = uccsd.init_amps(ue)
    for _ in range(2):
        a1, a2 = uccsd.update_amps(t1, t2, ue)
        b1, b2 = uccsd.update_amps(t1, t2, ud, ntile=2)
        for x, y in zip((*a1, *a2), (*b1, *b2)):
            assert float(jnp.abs(x - y).max()) < 1e-12
        t1, t2 = a1, a2


def test_ladder_tiled_non_divisor_nvir():
    """Regression: the DF ladder tile must accept nvir not divisible by
    ntile (OH(H2O)3/cc-pVDZ hit nvir=71 with ntile=4)."""
    import jax.numpy as jnp
    import numpy as np
    from pyscf_mpcc_tpu.cc.uccsd import _ladder_tiled
    rng = np.random.default_rng(3)
    naux, nv1, nv2, no = 9, 7, 5, 3
    L1 = jnp.asarray(rng.standard_normal((naux, nv1, nv1)))
    L2 = jnp.asarray(rng.standard_normal((naux, nv2, nv1)))
    tau = jnp.asarray(rng.standard_normal((no, no, nv1, nv1)))
    want = np.einsum("Lae,Lbf,ijef->ijab", L1, L2, tau, optimize=True)
    for ntile in (1, 2, 3, 4, 7, 11):
        got = _ladder_tiled(tau, L1, L2, ntile)
        assert np.abs(np.asarray(got) - want).max() < 1e-10, ntile
