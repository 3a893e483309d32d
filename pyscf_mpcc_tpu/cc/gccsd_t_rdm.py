"""Lambda-GCCSD(T) and GCCSD(T) response densities — by AD.

G-spin member of the (T)-response family (reference
cc/gccsd_t_lambda.py:1 + cc/gccsd_t_rdm.py:1): the spin-orbital (T)
functional of cc/uccsd_t_rdm.py IS the g-spin algebra, so this module
is thin — it feeds the GCCSD device engine's antisymmetrized GERIs
blocks (cc/gccsd.py) straight into e_t_so and drives the same
AD-Lagrangian construction:

    Lambda:   0 = d/dt [ E_GCCSD(t) + E_(T)(t) + <lambda, R(t)> ]
    RDMs:     gamma = d/d(integrals) of the stationary Lagrangian

Works for any spinor reference the GCCSD engine accepts (GHF, or
convert_to_ghf embeddings of R/U references).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import gccsd
from pyscf_mpcc_tpu.cc.uccsd_t_rdm import e_t_so


def e_t_g(t1, t2, eris_g, v_fac=1.0):
    """Dense differentiable GCCSD(T) energy from a GERIs container."""
    return e_t_so(t1, t2, eris_g.fock, eris_g.b["oovv"],
                  eris_g.b["ooov"], eris_g.b["ovvv"], eris_g.nocc,
                  v_fac=v_fac)


def residual_g(t1, t2, eris_g, variant="ccsd"):
    """GCCSD residual R = (update(t) - t) * D."""
    d1, d2 = gccsd._denoms(eris_g.fock, eris_g.nocc)
    t1n, t2n = gccsd._update(t1, t2, eris_g.b, eris_g.fock,
                             eris_g.nocc, variant=variant)
    return (t1n - t1) * d1, (t2n - t2) * d2


def lambda_kernel_g(t1, t2, eris_g, max_cycle=60, conv_tol=1e-6,
                    diis_space=6, verbose=0, v_fac=1.0, with_t=True):
    """Lambda-GCCSD(T) (with_t=False: plain Lambda-GCCSD).
    Returns (conv, l1, l2)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    nocc = eris_g.nocc
    d1, d2 = gccsd._denoms(eris_g.fock, nocc)

    @jax.jit
    def step(l1, l2):
        def efun(a, b):
            e = gccsd._energy(a, b, eris_g.b["oovv"], eris_g.fock, nocc)
            if with_t:
                e = e + e_t_g(a, b, eris_g, v_fac=v_fac)
            return e

        de1, de2 = jax.grad(efun, argnums=(0, 1))(t1, t2)
        _, vjp = jax.vjp(lambda a, b: residual_g(a, b, eris_g), t1, t2)
        j1, j2 = vjp((l1, l2))
        r1 = de1 + j1
        r2 = de2 + j2
        # project onto the antisymmetric doubles manifold
        r2 = 0.25 * (r2 - r2.transpose(1, 0, 2, 3)
                     - r2.transpose(0, 1, 3, 2)
                     + r2.transpose(1, 0, 3, 2))
        return l1 + r1 / d1, l2 + r2 / d2, r1, r2

    l1, l2 = t1, t2
    diis = DIIS(space=diis_space)
    converged = False
    nov = l1.size
    for it in range(max_cycle):
        l1n, l2n, r1, r2 = step(l1, l2)
        resn = float(jnp.linalg.norm(r1)) + float(jnp.linalg.norm(r2))
        vec = np.concatenate([np.asarray(l1n).ravel(),
                              np.asarray(l2n).ravel()])
        err = np.concatenate([np.asarray(r1).ravel(),
                              np.asarray(r2).ravel()])
        vec = diis.update(vec, xerr=err)
        l1 = jnp.asarray(vec[:nov].reshape(l1.shape))
        l2 = jnp.asarray(vec[nov:].reshape(l2.shape))
        log.info("glambda(T) cycle %2d  |res| = %9.3e", it, resn)
        if resn < conv_tol:
            converged = True
            break
    return converged, l1, l2


def _g_lagrangian_t(h_so, g_chem, t1, t2, l1, l2, nocc, v_fac=1.0,
                    with_t=True):
    """GHF-CCSD(T) total-energy Lagrangian as a functional of the
    spinor-MO integrals: h_so (nso,nso), g_chem (pq|rs) chemists'."""
    nso = h_so.shape[0]
    dm = jnp.zeros((nso, nso), h_so.dtype).at[
        jnp.arange(nocc), jnp.arange(nocc)].set(1.0)
    j = jnp.einsum("pqrs,rs->pq", g_chem, dm)
    k = jnp.einsum("prqs,rs->pq", g_chem, dm)
    fock = h_so + j - k
    e_hf = jnp.sum(dm * h_so) + 0.5 * jnp.sum(dm * (j - k))
    phys = jnp.einsum("prqs->pqrs", g_chem)
    anti = phys - phys.transpose(0, 1, 3, 2)
    o, v = slice(0, nocc), slice(nocc, nso)
    sl = {"o": o, "v": v}
    blocks = {key: anti[tuple(sl[c] for c in key)]
              for key in gccsd.GERIs.BLOCKS}
    eris = gccsd.GERIs.__new__(gccsd.GERIs)
    eris.b = blocks
    eris.fock = fock
    eris.nocc = nocc
    eris.nso = nso
    e = gccsd._energy(t1, t2, eris.b["oovv"], eris.fock, nocc)
    if with_t:
        e = e + e_t_g(t1, t2, eris, v_fac=v_fac)
    r1, r2 = residual_g(t1, t2, eris)
    return e_hf + e + jnp.vdot(l1, r1) + jnp.vdot(l2, r2)


@partial(jax.jit, static_argnames=("nocc", "with_t"))
def make_rdm12(h_so, g_chem, t1, t2, l1, l2, nocc, with_t=True):
    """GCCSD(T) response (rdm1, rdm2) in the spinor-MO basis, chemists'
    convention, satisfying  E_tot = h.rdm1 + 1/2 g.rdm2  with E_tot the
    stationary CCSD(T) Lagrangian (reference gccsd_t_rdm.make_rdm1/2
    role; with_t=False gives the plain GCCSD response of gccsd_rdm)."""
    dh, dg = jax.grad(_g_lagrangian_t, argnums=(0, 1))(
        h_so, g_chem, t1, t2, l1, l2, nocc, with_t=with_t)
    rdm1 = 0.5 * (dh + dh.T)
    rdm2 = 2.0 * dg
    rdm2 = 0.25 * (rdm2 + rdm2.transpose(1, 0, 3, 2)
                   + rdm2.transpose(2, 3, 0, 1)
                   + rdm2.transpose(3, 2, 1, 0))
    return rdm1, rdm2
