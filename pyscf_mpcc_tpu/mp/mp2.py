"""Restricted MP2: canonical, SCS split, density-fitted, and the
non-canonical iterative solver the MP-CC workflow needs.

Capability match for the reference's mp/mp2.py (kernel :34, _iterative_kernel
:99, update_amps :150) and mp/dfmp2.py, as pure JAX functions: the energy
contraction is one fused einsum chain on the MXU; the iterative solver is a
jitted Jacobi+DIIS loop usable with a non-diagonal (localized-orbital) Fock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def energy_from_t2(t2, ovov):
    """E_corr from spatial t2[ijab] and chemists (ia|jb)."""
    ed = 2.0 * jnp.einsum("ijab,iajb->", t2, ovov)
    ex = -jnp.einsum("ijab,ibja->", t2, ovov)
    return ed + ex


@jax.jit
def kernel(mo_energy_occ, mo_energy_vir, ovov):
    """Canonical RMP2.  ovov: (ia|jb) chemists MO integrals (nocc,nvir,nocc,nvir).

    Returns (e_mp2, t2) with t2[i,j,a,b] = (ia|jb)/D_ijab.
    """
    eo, ev = mo_energy_occ, mo_energy_vir
    d = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    t2 = ovov.transpose(0, 2, 1, 3) / d
    return energy_from_t2(t2, ovov), t2


@jax.jit
def kernel_ss_os(mo_energy_occ, mo_energy_vir, ovov):
    """MP2 with same-spin / opposite-spin decomposition (for SCS-MP2)."""
    eo, ev = mo_energy_occ, mo_energy_vir
    d = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    t2 = ovov.transpose(0, 2, 1, 3) / d
    e_os = jnp.einsum("ijab,iajb->", t2, ovov)
    e_ss = e_os - jnp.einsum("ijab,ibja->", t2, ovov)
    return e_ss, e_os


@jax.jit
def df_kernel(mo_energy_occ, mo_energy_vir, Lov):
    """DF-MP2 from 3-center factors Lov[P, i, a] (B tensor in MO basis).

    Equivalent of the reference's mp/dfmp2.py ovL path (dfmp2.py:269) with the
    per-(i,j) C loop replaced by one batched dot_general over the aux axis.
    """
    eo, ev = mo_energy_occ, mo_energy_vir
    ovov = jnp.einsum("Lia,Ljb->iajb", Lov, Lov)
    d = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    t2 = ovov.transpose(0, 2, 1, 3) / d
    return energy_from_t2(t2, ovov), t2


def update_amps(t2, ovov, foo, fvv):
    """One Jacobi sweep of the non-canonical MP2 residual.

    R_ijab = (ia|jb) + sum_c fvv[a,c] t2_ijcb + sum_c t2_ijac fvv[b,c]
                     - sum_k foo[i,k] t2_kjab - sum_k t2_ikab foo[j,k]
    solved as t2 <- t2 + R / D with D from the Fock diagonals (the off-
    diagonal Fock pieces stay in R).  Matches reference mp/mp2.py:150.
    """
    eo = jnp.diagonal(foo)
    ev = jnp.diagonal(fvv)
    d = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    r = ovov.transpose(0, 2, 1, 3)
    r = r + jnp.einsum("ac,ijcb->ijab", fvv, t2)
    r = r + jnp.einsum("bc,ijac->ijab", fvv, t2)
    r = r - jnp.einsum("ik,kjab->ijab", foo, t2)
    r = r - jnp.einsum("jk,ikab->ijab", foo, t2)
    return t2 + r / d, r


def iterative_kernel(ovov, foo, fvv, max_cycle=100, conv_tol=1e-9,
                     diis_space=6, verbose=0):
    """Non-canonical iterative MP2 (DIIS on t2), for localized-orbital Fock.

    Role of reference mp/mp2.py:99 (_iterative_kernel).  Host-driven loop with
    jitted updates; DIIS on the host in fp64.
    """
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    nocc, nvir = ovov.shape[0], ovov.shape[1]
    t2 = jnp.zeros((nocc, nocc, nvir, nvir), dtype=ovov.dtype)
    upd = jax.jit(update_amps)
    diis = DIIS(space=diis_space)
    e_last = 0.0
    converged = False
    for it in range(max_cycle):
        t2, r = upd(t2, ovov, foo, fvv)
        t2 = jnp.asarray(diis.update(np.asarray(t2),
                                     xerr=np.asarray(r)).reshape(t2.shape))
        e = float(energy_from_t2(t2, ovov))
        log.info("MP2 cycle %d  E = %.12f  dE = %.3e", it, e, e - e_last)
        if abs(e - e_last) < conv_tol:
            converged = True
            break
        e_last = e
    return e, t2, converged


def make_rdm1_vv(t2):
    """Virtual-virtual block of the unrelaxed MP2 density (FNO metric).

    P_ab = 2 sum_ijc t2[ijac] (2 t2[ijbc] - t2[ijcb]); validated against the
    spin-orbital density in tests.  Reference analog: mp/mp2.py make_fno
    (:239) intermediates."""
    theta = 2.0 * t2 - t2.transpose(0, 1, 3, 2)
    return 2.0 * jnp.einsum("ijac,ijbc->ab", t2, theta)


def make_rdm1(t2, nocc):
    """Unrelaxed MP2 one-particle density (MO basis), HF part included."""
    nvir = t2.shape[2]
    theta = 2.0 * t2 - t2.transpose(0, 1, 3, 2)
    doo = -2.0 * jnp.einsum("ikab,jkab->ij", t2, theta)
    dvv = 2.0 * jnp.einsum("ijac,ijbc->ab", t2, theta)
    dm = jnp.zeros((nocc + nvir, nocc + nvir), dtype=t2.dtype)
    dm = dm.at[:nocc, :nocc].set(2.0 * jnp.eye(nocc) + doo)
    dm = dm.at[nocc:, nocc:].set(dvv)
    return dm


def make_fno(t2, mo_energy, mo_coeff, nocc, thresh=1e-6, nvir_act=None):
    """Frozen-natural-orbital builder (reference mp/mp2.py:239).

    Diagonalizes the MP2 vv-density; returns (no_coeff, n_keep) where
    no_coeff has virtuals rotated to natural orbitals ordered by occupation
    (kept block first)."""
    dvv = np.asarray(make_rdm1_vv(t2))
    w, v = np.linalg.eigh(dvv)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    if nvir_act is None:
        n_keep = int((w > thresh).sum())
    else:
        n_keep = int(nvir_act)
    mo = np.asarray(mo_coeff).copy()
    mo[:, nocc:] = mo[:, nocc:] @ v
    return mo, n_keep, w
