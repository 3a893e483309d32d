"""DF low-level solver for MP-CC: t1-dressed screened-CC2.

Reference: pyscf/mpcc/dfrmpcc_lowlevel.py:103-152 and cc/umpcc_lowlevel.py
(following Mester, Nagy, Kallay, J. Chem. Phys. 146, 194102 (2017), Table I):
all two-electron quantities flow through t1-dressed 3-center factors

    Xoo[L,i,j] = sum_a Lov[L,i,a] t1[j,a]         Xvo[L,a,i] = sum_b Lvv[L,a,b] t1[i,b]
    X[L]       = sum_ia Lov[L,i,a] t1[i,a]
    Joo = Loo + Xoo          Jvo = Xvo + Lov^T - Joo . t1
    Jvv[L,b,a] = Lvv[L,b,a] + sum_j Lov[L,j,b] t1[j,a]

with the doubles amplitudes built on the fly (MP2-like from dressed
factors) and only the t1 residual iterated with DIIS.  The reference
module is WIP (breakpoint()s, index-algebra bugs); this implementation
fixes the tensor layouts ([a,i,b,j] doubles with exchange = (i<->j)
transpose) and keeps non-canonical Fock handling consistent with the rest
of the framework (off-diagonal Fock blocks in the residual, diagonal in
the denominators).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def update_amps(t1, Loo, Lov, Lvv, foo_nd, fvv_nd, eia):
    """One sweep.  t1: (nocc, nvir); eia[i,a] = e_a - e_i (positive gaps).

    Returns (t1_new, t2, de, res) with t2 in [a,i,b,j] layout.
    """
    D = -(eia.T[:, :, None, None] + eia.T[None, None, :, :])  # [a,i,b,j]

    Xvo = jnp.einsum("Lab,ib->Lai", Lvv, t1)
    Xoo = jnp.einsum("Lia,ja->Lij", Lov, t1)
    X = jnp.einsum("Lia,ia->L", Lov, t1)

    Joo = Loo + Xoo
    Jvo = Xvo + jnp.transpose(Lov, (0, 2, 1)) \
        - jnp.einsum("Lij,ja->Lai", Joo, t1)

    omega = -jnp.einsum("Laj,Lji->ai", Xvo, Joo)
    omega += jnp.einsum("Ljk,ka,Lji->ai", Xoo, t1, Joo)
    omega += jnp.einsum("Lai,L->ai", Jvo, X)
    omega += jnp.einsum("ib,ba->ai", t1, fvv_nd)
    omega -= jnp.einsum("ka,ik->ai", t1, foo_nd)

    Fov = jnp.einsum("Lbj,L->jb", Jvo, X) \
        - jnp.einsum("Lij,Lib->jb", Xoo, Lov)

    g = jnp.einsum("Lai,Lbj->aibj", Jvo, Jvo)
    t2 = (2.0 * g - g.transpose(0, 3, 2, 1)) / D

    Yvo = jnp.einsum("aibj,jb->ai", t2, Fov)
    omega += Yvo
    Yl = jnp.einsum("aibj,Ljb->Lai", t2, Lov)
    Jvv = Lvv + jnp.einsum("Ljb,ja->Lba", Lov, t1)
    omega += jnp.einsum("Lba,Lbi->ai", Jvv, Yl)
    omega -= jnp.einsum("Lji,Laj->ai", Joo, Yl)

    e1 = jnp.einsum("Lij,ja->Lai", Xoo, t1) \
        + jnp.einsum("L,ia->Lai", X, t1) + Jvo
    de = jnp.einsum("Lai,Lai->", e1, Yl)

    t1_new = -omega.T / eia
    res = jnp.linalg.norm(t1_new - t1)
    return t1_new, t2, de, res


def kernel(Loo, Lov, Lvv, fock_mo, nocc, max_cycle=100, conv_tol=1e-8,
           diis_space=6, verbose=0):
    """Iterate the low-level t1 with DIIS.  Returns (conv, energy, t1, t2)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    fock_mo = np.asarray(fock_mo)
    nmo = fock_mo.shape[0]
    eo = np.diag(fock_mo)[:nocc]
    ev = np.diag(fock_mo)[nocc:]
    eia = jnp.asarray(ev[None, :] - eo[:, None])  # [i,a], positive gaps
    foo_nd = jnp.asarray(fock_mo[:nocc, :nocc] - np.diag(eo))
    fvv_nd = jnp.asarray(fock_mo[nocc:, nocc:] - np.diag(ev))
    t1 = jnp.zeros((nocc, nmo - nocc), dtype=Lov.dtype)
    diis = DIIS(space=diis_space)
    e_last = 0.0
    converged = False
    de = 0.0
    t2 = None
    for it in range(max_cycle):
        t1_new, t2, de, res = update_amps(t1, Loo, Lov, Lvv,
                                          foo_nd, fvv_nd, eia)
        t1 = jnp.asarray(diis.update(np.asarray(t1_new),
                                     xerr=np.asarray(t1_new - t1))
                         .reshape(t1.shape))
        de_f = float(de)
        log.info("LL cycle %2d  E = %.12f  dE = %.3e  |dt1| = %.3e",
                 it, de_f, de_f - e_last, float(res))
        if float(res) < conv_tol:
            converged = True
            break
        e_last = de_f
    return converged, float(de), t1, t2
