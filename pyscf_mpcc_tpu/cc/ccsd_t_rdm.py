"""Lambda-CCSD(T) and CCSD(T) response density matrices — by AD.

Role of the reference's cc/ccsd_t_lambda_slow.py + cc/ccsd_t_rdm_slow.py
(and their g/u analogs, ~2.5 kLoC of hand-derived intermediates): the
triples correction contributes to the Lambda equations through dE(T)/dt
and to the density matrices through the integral dependence of E(T).
Here both enter through jax.grad of ONE differentiable (T) energy
functional:

    Lambda:   0 = d/dt [ E_CCSD(t) + E_(T)(t) + <lambda, R(t)> ]
    RDMs:     gamma = d/d(integrals) of the stationary Lagrangian

so the entire hand-derived (T)-Lambda/RDM intermediate algebra is
generated exactly by AD.  The (T) functional is the dense (single-tile)
statement of the production kernel's math (cc/ccsd_t.py); it
materializes W/V over the full virtual cube, so this module serves
small/medium systems — the tier the reference's *_slow modules serve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import lambda_ad, rccsd
from pyscf_mpcc_tpu.cc.eris import RERIs

PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))


def e_t_dense(t1, t2, eris, v_fac=1.0):
    """Differentiable closed-shell (T) energy, dense over the virtual
    cube — the tile math of cc/ccsd_t.py with one full-size tile.
    The P-symmetrized integrand is permutation symmetric in (a,b,c), so
    the all-cube sum equals the weighted a>=b>=c triangle of the
    production kernel (weights 1 / 1/2 / 1/6) times 6.

    v_fac scales the disconnected singles part of V: 1.0 -> CCSD(T),
    2.0 -> QCISD(T) (reference QCIsd_t_contract fac=2.0)."""
    nocc, nvir = t1.shape
    eo = eris.mo_energy[:nocc]
    ev = eris.mo_energy[nocc:]
    fvo = eris.fock[nocc:, :nocc]
    if eris.ovvv is not None:
        ov = eris.ovvv.transpose(1, 3, 0, 2)      # ov[x,y,i,f] = (ix|fy)
    else:
        ov = jnp.einsum("Lix,Lfy->xyif", eris.Lov, eris.Lvv)
    # t2T[c,f,j,k] = t2[k,j,c,f]; vooo[a,i,j,m] = (ia|jm)
    t2T = t2.transpose(2, 3, 1, 0)
    vooo = eris.ovoo.transpose(1, 0, 2, 3)
    oovv = eris.ovov.transpose(0, 2, 1, 3)        # oovv[i,j,x,y] = (ix|jy)

    W = jnp.zeros((nvir,) * 3 + (nocc,) * 3, t2.dtype)
    V = jnp.zeros_like(W)
    for p in PERMS:
        w = jnp.einsum("xyif,zfjk->xyzijk", ov, t2T)
        w -= jnp.einsum("xijm,zymk->xyzijk", vooo, t2T)
        v = (0.5 * v_fac) * (jnp.einsum("ijxy,kz->xyzijk", oovv, t1)
                             + jnp.einsum("yxij,zk->xyzijk", t2T, fvo))
        inv = (p.index(0), p.index(1), p.index(2))
        axes = tuple(inv) + tuple(3 + q for q in inv)
        W += jnp.transpose(w, axes)
        V += jnp.transpose(v, axes)

    V = V + W
    Z = (4.0 * V
         + V.transpose(0, 1, 2, 4, 5, 3)
         + V.transpose(0, 1, 2, 5, 3, 4)
         - 2.0 * V.transpose(0, 1, 2, 5, 4, 3)
         - 2.0 * V.transpose(0, 1, 2, 3, 5, 4)
         - 2.0 * V.transpose(0, 1, 2, 4, 3, 5))
    eijk = (eo[:, None, None] + eo[None, :, None] + eo[None, None, :])
    eabc = (ev[:, None, None] + ev[None, :, None] + ev[None, None, :])
    denom = eijk[None, None, None] - eabc[:, :, :, None, None, None]
    return (2.0 / 6.0) * jnp.einsum("xyzijk,xyzijk->", W, Z / denom)


def lambda_kernel(t1, t2, eris, max_cycle=50, conv_tol=1e-7,
                  diis_space=6, verbose=0):
    """Lambda-CCSD(T): solve lambda^T dR/dt = -d(E_CCSD + E_(T))/dt
    (reference ccsd_t_lambda_slow.kernel role).  Returns (conv, l1, l2)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    nocc, nvir = t1.shape
    eia, d2 = lambda_ad._denominators(eris, nocc)

    @jax.jit
    def step(l1, l2):
        def efun(a, b):
            return rccsd.energy(a, b, eris) + e_t_dense(a, b, eris)

        de1, de2 = jax.grad(efun, argnums=(0, 1))(t1, t2)
        _, vjp = jax.vjp(lambda a, b: lambda_ad.residual(a, b, eris),
                         t1, t2)
        j1, j2 = vjp((l1, l2))
        res1 = de1 + j1
        res2 = de2 + j2
        res2 = 0.5 * (res2 + res2.transpose(1, 0, 3, 2))
        return l1 + res1 / eia, l2 + res2 / d2, res1, res2

    l1, l2 = t1, t2
    diis = DIIS(space=diis_space)
    converged = False
    for it in range(max_cycle):
        l1n, l2n, r1, r2 = step(l1, l2)
        normt = float(jnp.linalg.norm(l1n - l1) + jnp.linalg.norm(l2n - l2))
        vec = np.concatenate([np.asarray(l1n).ravel(),
                              np.asarray(l2n).ravel()])
        err = np.concatenate([np.asarray(r1).ravel(),
                              np.asarray(r2).ravel()])
        vec = diis.update(vec, xerr=err)
        l1 = jnp.asarray(vec[: nocc * nvir].reshape(nocc, nvir))
        l2 = jnp.asarray(vec[nocc * nvir:].reshape(t2.shape))
        if normt < conv_tol:
            converged = True
            break
    return converged, l1, l2


def _lagrangian_t(h_mo, eri_mo, dm_mo, t1, t2, l1, l2, nocc):
    """E_HF + E_CCSD + E_(T) + <lambda, R> as a functional of the MO
    integrals (fixed density/amplitudes/multipliers)."""
    nmo = h_mo.shape[0]
    j = jnp.einsum("pqrs,rs->pq", eri_mo, dm_mo)
    k = jnp.einsum("prqs,rs->pq", eri_mo, dm_mo)
    veff = j - 0.5 * k
    e_hf = jnp.einsum("pq,pq->", dm_mo, h_mo) \
        + 0.5 * jnp.einsum("pq,pq->", dm_mo, veff)
    fock = h_mo + veff
    o = slice(0, nocc)
    v = slice(nocc, nmo)
    eris = RERIs(
        fock=fock, mo_energy=jnp.diagonal(fock),
        oooo=eri_mo[o, o, o, o], ovoo=eri_mo[o, v, o, o],
        ovov=eri_mo[o, v, o, v], oovv=eri_mo[o, o, v, v],
        ovvo=eri_mo[o, v, v, o], ovvv=eri_mo[o, v, v, v],
        vvvv=eri_mo[v, v, v, v],
    )
    e = rccsd.energy(t1, t2, eris) + e_t_dense(t1, t2, eris)
    r1, r2 = lambda_ad.residual(t1, t2, eris)
    return e_hf + e + jnp.vdot(l1, r1) + jnp.vdot(l2, r2)


@partial(jax.jit, static_argnames=("nocc",))
def make_rdm12(h_mo, eri_mo, t1, t2, l1, l2, nocc):
    """CCSD(T) response (rdm1, rdm2), chemists' convention, satisfying
    E_elec = h.rdm1 + 1/2 eri.rdm2 exactly (reference
    ccsd_t_rdm_slow.make_rdm1/2 role).  l1/l2 from lambda_kernel."""
    nmo = h_mo.shape[0]
    dm_mo = jnp.zeros((nmo, nmo), h_mo.dtype).at[
        jnp.arange(nocc), jnp.arange(nocc)].set(2.0)
    dh, dg = jax.grad(_lagrangian_t, argnums=(0, 1))(
        h_mo, eri_mo, dm_mo, t1, t2, l1, l2, nocc)
    rdm1 = 0.5 * (dh + dh.T)
    rdm2 = 2.0 * dg
    rdm2 = 0.25 * (rdm2 + rdm2.transpose(1, 0, 3, 2)
                   + rdm2.transpose(2, 3, 0, 1) + rdm2.transpose(3, 2, 1, 0))
    return rdm1, rdm2
