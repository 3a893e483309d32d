"""Lambda-UCCSD(T) and UCCSD(T) response density matrices — by AD.

Open-shell twin of cc/ccsd_t_rdm.py, filling the role of the
reference's cc/uccsd_t_lambda.py:30 + cc/uccsd_t_rdm.py:1 (and the
g-spin pair gccsd_t_lambda.py / gccsd_t_rdm.py — the spin-orbital
formulation here IS the g-spin algebra, evaluated on the UHF spin
blocks), ~810 LoC of hand-derived intermediates upstream.  Here both
the (T)-perturbed Lambda equations and the response densities are
generated exactly by jax.grad of ONE differentiable spin-orbital (T)
energy functional:

    Lambda:   0 = d/dt [ E_UCCSD(t) + E_(T)(t) + <lambda, R(t)> ]
    RDMs:     gamma = d/d(integrals) of the stationary Lagrangian

The (T) functional is the dense antisymmetrized spin-orbital statement
(JCP 98, 8718 (1993), the formula of reference gccsd_t.py:46 get_wv)
including the f_vo disconnected term — numerically zero at canonical
convergence but load-bearing for the response: its integral dependence
(and that of the fock-diagonal denominators) generates the
orbital-response blocks that the reference writes out by hand.  Dense
over the spin-orbital cube, so this module serves the small/medium
tier — exactly the tier the reference's *_lambda/*_rdm modules serve
(their t3 is dense too).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import lambda_ad, uccsd, uccsd_t


def _to_so_jnp(t1, t2, na, nb):
    """Differentiable spin-orbital embedding of blocked U amplitudes
    (traceable twin of uccsd.to_spin_orbital)."""
    t1a, t1b = t1
    t2aa, t2ab, t2bb = t2
    va = t1a.shape[1]
    vb = t1b.shape[1]
    no, nv = na + nb, va + vb
    T1 = jnp.zeros((no, nv), t1a.dtype)
    T1 = T1.at[:na, :va].set(t1a).at[na:, va:].set(t1b)
    T2 = jnp.zeros((no, no, nv, nv), t2ab.dtype)
    T2 = (T2.at[:na, :na, :va, :va].set(t2aa)
          .at[na:, na:, va:, va:].set(t2bb)
          .at[:na, na:, :va, va:].set(t2ab)
          .at[na:, :na, va:, :va].set(t2ab.transpose(1, 0, 3, 2))
          .at[:na, na:, va:, :va].set(-t2ab.transpose(0, 1, 3, 2))
          .at[na:, :na, :va, va:].set(-t2ab.transpose(1, 0, 2, 3)))
    return T1, T2


def _antisym_phys(c_ooov, c_ovov, c_ovvv):
    """Antisymmetrized physicists' blocks <pq||rs> from spin-orbital
    chemists' tensors (uccsd_t._so_chem_* layout):
      oovv[i,j,x,y] = <ij||xy>, ooov[i,j,m,x] = <ij||mx>,
      ovvv[i,x,y,z] = <ix||yz>."""
    oovv = (jnp.einsum("ixjy->ijxy", c_ovov)
            - jnp.einsum("iyjx->ijxy", c_ovov))
    ooov = (jnp.einsum("imjx->ijmx", c_ooov)
            - jnp.einsum("jmix->ijmx", c_ooov))
    ovvv = (jnp.einsum("iyxz->ixyz", c_ovvv)
            - jnp.einsum("izxy->ixyz", c_ovvv))
    return oovv, ooov, ovvv


def e_t_so(T1, T2, fso, oovv, ooov, ovvv, nocc, v_fac=1.0):
    """Dense differentiable spin-orbital (T) energy.

    E(T) = (1/36) sum_{ijkabc} W (W + v_fac*V) / D with fully
    P(i/jk)P(a/bc)-antisymmetrized W, V (reference gccsd_t.py:46;
    in-repo oracle cc/gccsd_t_slow.py) and the disconnected V carrying
    BOTH the t1<jk||bc> and the f_vo t2 terms.  v_fac=2 gives QCISD(T)
    (reference qcisd_t.py fac=2.0)."""
    mo_e = jnp.diagonal(fso)
    eo, ev = mo_e[:nocc], mo_e[nocc:]
    fvo = fso[nocc:, :nocc]
    w = (jnp.einsum("jkae,iecb->ijkabc", T2, ovvv)
         - jnp.einsum("imbc,jkma->ijkabc", T2, ooov))
    v = (jnp.einsum("ia,jkbc->ijkabc", T1, oovv)
         + jnp.einsum("ai,jkbc->ijkabc", fvo, T2))

    def pijk(x):
        return x - x.transpose(1, 0, 2, 3, 4, 5) - x.transpose(2, 1, 0, 3, 4, 5)

    def pabc(x):
        return x - x.transpose(0, 1, 2, 4, 3, 5) - x.transpose(0, 1, 2, 5, 4, 3)

    W = pabc(pijk(w))
    V = pabc(pijk(v))
    d3 = (eo[:, None, None, None, None, None]
          + eo[None, :, None, None, None, None]
          + eo[None, None, :, None, None, None]
          - ev[None, None, None, :, None, None]
          - ev[None, None, None, None, :, None]
          - ev[None, None, None, None, None, :])
    return (1.0 / 36.0) * jnp.sum(W * (W + v_fac * V) / d3)


def _so_fock(eris_u):
    """Spin-orbital fock in the [occ_a, occ_b | vir_a, vir_b] ordering
    (constant assembly, host side)."""
    na, nb = eris_u.nocca, eris_u.noccb
    fa = np.asarray(eris_u.focka)
    fb = np.asarray(eris_u.fockb)
    nmoa, nmob = fa.shape[0], fb.shape[0]
    va, vb = nmoa - na, nmob - nb
    O, V = na + nb, va + vb
    f = np.zeros((O + V, O + V), fa.dtype)
    ia = np.concatenate([np.arange(na), np.arange(na, nmoa)])
    ib = np.concatenate([np.arange(nb), np.arange(nb, nmob)])
    pa = np.concatenate([np.arange(na), O + np.arange(va)])
    pb = np.concatenate([na + np.arange(nb), O + va + np.arange(vb)])
    f[np.ix_(pa, pa)] = fa[np.ix_(ia, ia)]
    f[np.ix_(pb, pb)] = fb[np.ix_(ib, ib)]
    return f


def _so_consts(eris_u, dtype=jnp.float64):
    """One-time (non-differentiable) spin-orbital integral assembly from
    a UERIs container, for the Lambda solve's (T) functional."""
    c_ooov = uccsd_t._so_chem_ooov(eris_u, dtype)
    c_ovov = uccsd_t._so_chem_ovov(eris_u, dtype)
    c_ovvv = uccsd_t._so_chem_ovvv(eris_u, dtype)
    oovv, ooov, ovvv = _antisym_phys(c_ooov, c_ovov, c_ovvv)
    fso = jnp.asarray(_so_fock(eris_u), dtype)
    return fso, oovv, ooov, ovvv


def e_t_dense_u(t1, t2, eris_u, v_fac=1.0, _consts=None):
    """Differentiable-in-amplitudes dense UCCSD(T) energy (cross-checks
    the production tiled engine uccsd_t.kernel at small sizes)."""
    na, nb = eris_u.nocca, eris_u.noccb
    if _consts is None:
        _consts = _so_consts(eris_u, jnp.result_type(t2[1]))
    fso, oovv, ooov, ovvv = _consts
    T1, T2 = _to_so_jnp(t1, t2, na, nb)
    return e_t_so(T1, T2, fso, oovv, ooov, ovvv, na + nb, v_fac=v_fac)


def lambda_kernel_u(t1, t2, eris_u, max_cycle=60, conv_tol=1e-6,
                    diis_space=6, verbose=0, v_fac=1.0):
    """Lambda-UCCSD(T): solve  lambda^T dR/dt = -d(E_UCCSD + E_(T))/dt
    (reference uccsd_t_lambda.kernel role).  Returns (conv, l1, l2)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    na, nb = eris_u.nocca, eris_u.noccb
    d1, d2 = lambda_ad._u_denoms(eris_u)
    consts = _so_consts(eris_u, jnp.result_type(t2[1]))

    @jax.jit
    def step(l1, l2):
        def efun(a, b):
            return (uccsd.energy(a, b, eris_u)
                    + e_t_dense_u(a, b, eris_u, v_fac=v_fac,
                                  _consts=consts))

        de1, de2 = jax.grad(efun, argnums=(0, 1))(t1, t2)
        _, vjp = jax.vjp(
            lambda a, b: lambda_ad.residual_u(a, b, eris_u), t1, t2)
        j1, j2 = vjp((l1, l2))
        res1 = tuple(a + b for a, b in zip(de1, j1))
        res2 = tuple(a + b for a, b in zip(de2, j2))
        raa = 0.25 * (res2[0] - res2[0].transpose(1, 0, 2, 3)
                      - res2[0].transpose(0, 1, 3, 2)
                      + res2[0].transpose(1, 0, 3, 2))
        rbb = 0.25 * (res2[2] - res2[2].transpose(1, 0, 2, 3)
                      - res2[2].transpose(0, 1, 3, 2)
                      + res2[2].transpose(1, 0, 3, 2))
        res2 = (raa, res2[1], rbb)
        l1n = tuple(l + r / d for l, r, d in zip(l1, res1, d1))
        l2n = tuple(l + r / d for l, r, d in zip(l2, res2, d2))
        return l1n, l2n, res1, res2

    l1, l2 = tuple(t1), tuple(t2)
    shapes = [x.shape for x in (*l1, *l2)]
    diis = DIIS(space=diis_space)
    converged = False
    for it in range(max_cycle):
        l1n, l2n, r1, r2 = step(l1, l2)
        resn = sum(float(jnp.linalg.norm(x)) for x in (*r1, *r2))
        vec = np.asarray(uccsd.amplitudes_to_vector(l1n, l2n))
        err = np.asarray(uccsd.amplitudes_to_vector(r1, r2))
        vec = diis.update(vec, xerr=err)
        l1, l2 = uccsd.vector_to_amplitudes(jnp.asarray(vec), shapes)
        log.info("ulambda(T) cycle %2d  |res| = %9.3e", it, resn)
        if resn < conv_tol:
            converged = True
            break
    return converged, l1, l2


def _so_chem_of_g(g_aa, g_ab, g_bb, nocca, noccb):
    """Differentiable spin-orbital chemists' tensors from the per-spin
    dense MO integrals (the traceable twin of uccsd_t._so_chem_*)."""
    nmoa, nmob = g_aa.shape[0], g_bb.shape[0]
    na, nb = nocca, noccb
    va, vb = nmoa - na, nmob - nb
    O, V = na + nb, va + vb
    oa, vva = slice(0, na), slice(na, nmoa)
    ob, vvb = slice(0, nb), slice(nb, nmob)
    g_ba = jnp.einsum("pqRS->RSpq", g_ab)
    dt = g_ab.dtype

    c_ooov = jnp.zeros((O, O, O, V), dt)
    c_ooov = (c_ooov.at[:na, :na, :na, :va].set(g_aa[oa, oa, oa, vva])
              .at[:na, :na, na:, va:].set(g_ab[oa, oa, ob, vvb])
              .at[na:, na:, :na, :va].set(g_ba[ob, ob, oa, vva])
              .at[na:, na:, na:, va:].set(g_bb[ob, ob, ob, vvb]))
    c_ovov = jnp.zeros((O, V, O, V), dt)
    c_ovov = (c_ovov.at[:na, :va, :na, :va].set(g_aa[oa, vva, oa, vva])
              .at[:na, :va, na:, va:].set(g_ab[oa, vva, ob, vvb])
              .at[na:, va:, :na, :va].set(g_ba[ob, vvb, oa, vva])
              .at[na:, va:, na:, va:].set(g_bb[ob, vvb, ob, vvb]))
    c_ovvv = jnp.zeros((O, V, V, V), dt)
    c_ovvv = (c_ovvv.at[:na, :va, :va, :va].set(g_aa[oa, vva, vva, vva])
              .at[:na, :va, va:, va:].set(g_ab[oa, vva, vvb, vvb])
              .at[na:, va:, :va, :va].set(g_ba[ob, vvb, vva, vva])
              .at[na:, va:, va:, va:].set(g_bb[ob, vvb, vvb, vvb]))
    return c_ooov, c_ovov, c_ovvv


def _so_fock_of(fa, fb, nocca, noccb):
    """Differentiable spin-orbital fock from per-spin focks."""
    nmoa, nmob = fa.shape[0], fb.shape[0]
    na, nb = nocca, noccb
    va, vb = nmoa - na, nmob - nb
    O, V = na + nb, va + vb
    f = jnp.zeros((O + V, O + V), fa.dtype)
    f = (f.at[:na, :na].set(fa[:na, :na])
         .at[:na, O:O + va].set(fa[:na, na:])
         .at[O:O + va, :na].set(fa[na:, :na])
         .at[O:O + va, O:O + va].set(fa[na:, na:])
         .at[na:O, na:O].set(fb[:nb, :nb])
         .at[na:O, O + va:].set(fb[:nb, nb:])
         .at[O + va:, na:O].set(fb[nb:, :nb])
         .at[O + va:, O + va:].set(fb[nb:, nb:]))
    return f


def _u_lagrangian_t(h_a, h_b, g_aa, g_ab, g_bb, t1, t2, l1, l2,
                    nocca, noccb, v_fac=1.0):
    """UHF-CCSD(T) total-energy Lagrangian as a functional of the
    per-spin MO integrals: lambda_ad._u_lagrangian_of_integrals plus the
    (T) energy rebuilt differentiably from the same tensors (fock AND
    denominators included, so AD generates the full orbital response)."""
    base = lambda_ad._u_lagrangian_of_integrals(
        h_a, h_b, g_aa, g_ab, g_bb, t1, t2, l1, l2, nocca, noccb)
    fa, fb = lambda_ad._u_fock_of_integrals(
        h_a, h_b, g_aa, g_ab, g_bb, nocca, noccb)[:2]
    c_ooov, c_ovov, c_ovvv = _so_chem_of_g(g_aa, g_ab, g_bb, nocca, noccb)
    oovv, ooov, ovvv = _antisym_phys(c_ooov, c_ovov, c_ovvv)
    fso = _so_fock_of(fa, fb, nocca, noccb)
    T1, T2 = _to_so_jnp(t1, t2, nocca, noccb)
    et = e_t_so(T1, T2, fso, oovv, ooov, ovvv, nocca + noccb, v_fac=v_fac)
    return base + et


@partial(jax.jit, static_argnames=("nocca", "noccb"))
def make_rdm12(h_a, h_b, g_aa, g_ab, g_bb, t1, t2, l1, l2, nocca, noccb):
    """UCCSD(T) response densities (reference uccsd_t_rdm.make_rdm1/2
    role): ((dm1a, dm1b), (dm2aa, dm2ab, dm2bb)) in the per-spin MO
    bases, chemists' convention, satisfying

        E_tot = h_a.dm1a + h_b.dm1b + 1/2 g_aa.dm2aa + 1/2 g_bb.dm2bb
                + g_ab.dm2ab

    with E_tot the stationary CCSD(T) Lagrangian.  l1/l2 must come from
    lambda_kernel_u (the (T)-perturbed Lambda)."""
    grads = jax.grad(_u_lagrangian_t, argnums=(0, 1, 2, 3, 4))(
        h_a, h_b, g_aa, g_ab, g_bb, t1, t2, l1, l2, nocca, noccb)
    dha, dhb, dgaa, dgab, dgbb = grads
    dm1a = 0.5 * (dha + dha.T)
    dm1b = 0.5 * (dhb + dhb.T)

    def sym4(x):
        return 0.25 * (x + x.transpose(1, 0, 3, 2)
                       + x.transpose(2, 3, 0, 1) + x.transpose(3, 2, 1, 0))

    dm2aa = 2.0 * sym4(dgaa)
    dm2bb = 2.0 * sym4(dgbb)
    dm2ab = 0.5 * (dgab + dgab.transpose(1, 0, 3, 2))
    return (dm1a, dm1b), (dm2aa, dm2ab, dm2bb)
