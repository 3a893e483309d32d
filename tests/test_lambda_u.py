"""Unrestricted Lambda: validated by the defining property of the CC
Lagrangian — its derivative w.r.t. a Fock perturbation at fixed (t, lambda)
equals the derivative of the fully re-solved CC energy."""

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import lambda_ad, uccsd
from pyscf_mpcc_tpu.scf import RHF


def test_ulambda_lagrangian_derivative():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    eri = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    ue = uccsd.make_eris_incore(eri, mf.mo_coeff, mf.mo_coeff, f, f, 5, 5)
    conv, e0, t1u, t2u = uccsd.kernel(ue, conv_tol=1e-12,
                                      conv_tol_normt=1e-10, max_cycle=150)
    assert conv
    convl, l1u, l2u = lambda_ad.kernel_u(t1u, t2u, ue, conv_tol=1e-9,
                                         max_cycle=80)
    assert convl

    rng = np.random.RandomState(5)
    V = rng.randn(7, 7) * 0.01
    V = 0.5 * (V + V.T)
    Vj = jnp.asarray(V)

    def eris_eps(eps):
        return ue._replace(focka=ue.focka + eps * Vj,
                           fockb=ue.fockb + eps * Vj)

    def lagr(eps):
        er = eris_eps(eps)
        e = uccsd.energy(t1u, t2u, er)
        r1, r2 = lambda_ad.residual_u(t1u, t2u, er)
        return e + sum(jnp.vdot(l, r)
                       for l, r in zip((*l1u, *l2u), (*r1, *r2)))

    dpred = float(jax.grad(lagr)(0.0))

    def esolve(eps):
        conv_, e, *_ = uccsd.kernel(eris_eps(eps), conv_tol=1e-12,
                                    conv_tol_normt=1e-10, max_cycle=150,
                                    t1=t1u, t2=t2u)
        assert conv_
        return e

    h = 2e-4
    dfd = (esolve(h) - esolve(-h)) / (2 * h)
    assert abs(dpred - dfd) < 1e-8
