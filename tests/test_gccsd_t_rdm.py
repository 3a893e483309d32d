"""Lambda-GCCSD(T) + response densities (cc/gccsd_t_rdm.py).

Reference capability: pyscf/cc/gccsd_t_lambda.py + gccsd_t_rdm.py —
the g-spin (T)-response pair, here driven by the same AD spin-orbital
(T) functional as the U module (cc/uccsd_t_rdm.py, oracle-pinned)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import gccsd, gccsd_t_rdm, gccsd_t_slow
from pyscf_mpcc_tpu.scf import GHF


@pytest.fixture(scope="module")
def oh_ghf_solved():
    mol = gto.M(atom="O 0 0 0; H 0 0 0.97", basis="sto-3g", spin=1)
    mf = GHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    er = gccsd.make_eris_ghf(mf)
    e_corr, t1, t2, conv = gccsd.kernel(er, conv_tol=1e-11,
                                        conv_tol_normt=1e-9)
    assert conv
    return mol, mf, er, e_corr, t1, t2


def test_e_t_g_matches_oracle(oh_ghf_solved):
    mol, mf, er, e_corr, t1, t2 = oh_ghf_solved
    et_ref = gccsd_t_slow.kernel(np.asarray(t1), np.asarray(t2), er)
    et = float(gccsd_t_rdm.e_t_g(t1, t2, er))
    # the oracle omits the f_vo term (zero to SCF convergence here)
    assert abs(et - et_ref) < 1e-12
    assert abs(et) > 1e-9


def test_lambda_g_and_response_rdms(oh_ghf_solved):
    mol, mf, er, e_corr, t1, t2 = oh_ghf_solved
    et = float(gccsd_t_rdm.e_t_g(t1, t2, er))
    cl, l1, l2 = gccsd_t_rdm.lambda_kernel_g(t1, t2, er, conv_tol=1e-9,
                                             max_cycle=100)
    assert cl
    nao = mol.nao
    C = np.asarray(mf.mo_coeff)
    Ca, Cb = C[:nao], C[nao:]
    eri = np.asarray(gto.intor_eri(mol))
    t = (np.einsum("pqrs,pP,qQ->PQrs", eri, Ca, Ca, optimize=True)
         + np.einsum("pqrs,pP,qQ->PQrs", eri, Cb, Cb, optimize=True))
    g_chem = (np.einsum("PQrs,rR,sS->PQRS", t, Ca, Ca, optimize=True)
              + np.einsum("PQrs,rR,sS->PQRS", t, Cb, Cb, optimize=True))
    h_ao = np.asarray(mf.get_hcore())
    h1 = h_ao[:nao, :nao] if h_ao.shape[0] == 2 * nao else h_ao
    hso = Ca.T @ h1 @ Ca + Cb.T @ h1 @ Cb
    d1, d2 = gccsd_t_rdm.make_rdm12(jnp.asarray(hso), jnp.asarray(g_chem),
                                    t1, t2, l1, l2, er.nocc)
    assert abs(float(jnp.trace(d1)) - mol.nelectron) < 1e-9
    e_dm = float(jnp.sum(d1 * hso)
                 + 0.5 * jnp.einsum("pqrs,pqrs->", jnp.asarray(g_chem), d2))
    e_expect = float(mf.e_tot) - mol.energy_nuc() + e_corr + et
    assert abs(e_dm - e_expect) < 1e-9
    # hermiticity + rdm2 permutational symmetry of the chemists' tensor
    assert float(jnp.abs(d1 - d1.T).max()) < 1e-12
    assert float(jnp.abs(d2 - jnp.transpose(d2, (2, 3, 0, 1))).max()) < 1e-12
