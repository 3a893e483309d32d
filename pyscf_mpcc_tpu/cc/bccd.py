"""Brueckner coupled cluster doubles (BCCD).

Role of the reference's cc/bccd.py: iterate CCSD and absorb the converged
singles into an orbital rotation until t1 vanishes — the Brueckner
condition.  Rotation: C_occ' spans {C_occ + C_vir t1^T}, C_vir' the
orthogonal complement (symmetric orthonormalization in the S metric).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from pyscf_mpcc_tpu.cc import eris as eris_mod, rccsd


def _rotate_brueckner(mo, t1, S):
    """Absorb t1 into a unitary orbital rotation exp(kappa),
    kappa_ov = -t1 (antisymmetric completion)."""
    nocc, nvir = t1.shape
    nmo = nocc + nvir
    kappa = np.zeros((nmo, nmo))
    kappa[:nocc, nocc:] = -np.asarray(t1)
    kappa[nocc:, :nocc] = np.asarray(t1).T
    u = scipy.linalg.expm(kappa)
    return mo @ u


def kernel(mf, eri_ao, max_macro=30, t1_tol=1e-5, cc_conv=1e-9,
           verbose=0, diis=True):
    """BCCD macro-iteration.  Returns (e_corr, mo_brueckner, t2, n_macro).

    The returned correlation energy is measured against the ORIGINAL HF
    reference determinant's energy (e_tot stays comparable)."""
    from pyscf_mpcc_tpu.lib import logger as lg
    from pyscf_mpcc_tpu.lib.diis import DIIS
    log = lg.Logger(verbose=verbose)
    mol = mf.mol
    nocc = mol.nelectron // 2
    mo0 = np.asarray(mf.mo_coeff).copy()
    mo = mo0.copy()
    nmo = mo.shape[1]
    u_tot = np.eye(nmo)
    adiis = DIIS(space=6) if diis else None
    S = mf.S
    dm_hf = mf.make_rdm1()
    e_hf = mf.e_tot
    e_tot = None
    for it in range(max_macro):
        # Fock of the ORIGINAL HF density, in the current orbital basis
        fock_ao = mf.get_fock(dm_hf)
        er = eris_mod.make_eris_incore(eri_ao, mo, fock_ao, nocc)
        conv, e_corr, t1, t2 = rccsd.kernel(er, conv_tol=cc_conv,
                                            conv_tol_normt=1e-7,
                                            max_cycle=100)
        if not conv:
            raise RuntimeError("CCSD inner loop did not converge")
        t1max = float(np.abs(np.asarray(t1)).max())
        # reference energy of the rotated determinant
        dm_cur = 2.0 * mo[:, :nocc] @ mo[:, :nocc].T
        e_ref = float(0.5 * np.einsum(
            "pq,pq->", dm_cur, mf.get_hcore() + mf.get_fock(dm_cur))
            + mf.e_nuc)
        e_tot = e_ref + e_corr
        log.info("BCCD macro %2d  E_tot = %.12f  max|t1| = %.3e",
                 it, e_tot, t1max)
        if t1max < t1_tol:
            return float(e_tot - e_hf), mo, t2, it + 1
        # accumulate the rotation; DIIS over u with the t1 residual as the
        # Pulay error (reference bccd.py diis=True semantics), then restore
        # unitarity by polar decomposition
        nocc_, nvir_ = np.asarray(t1).shape
        kappa = np.zeros((nmo, nmo))
        kappa[:nocc_, nocc_:] = -np.asarray(t1)
        kappa[nocc_:, :nocc_] = np.asarray(t1).T
        u_tot = u_tot @ scipy.linalg.expm(kappa)
        if adiis is not None:
            u_tot = adiis.update(u_tot.ravel(),
                                 xerr=np.asarray(t1).ravel()).reshape(nmo, nmo)
            uu, _, vv = np.linalg.svd(u_tot)
            u_tot = uu @ vv
        mo = mo0 @ u_tot
    raise RuntimeError("BCCD did not converge")


def kernel_t(mf, eri_ao, **kw):
    """BCCD(T): the perturbative triples on the converged Brueckner
    orbitals/amplitudes (t1 = 0 by construction, so only the connected
    W survives; reference bccd.py bccd_kernel_ + ccsd_t pattern).

    Returns (e_bccd, e_t, mo_brueckner)."""
    from pyscf_mpcc_tpu.cc import ccsd_t
    e_corr, mo, t2, _ = kernel(mf, eri_ao, **kw)
    nocc = mf.mol.nelectron // 2
    fock_ao = mf.get_fock(mf.make_rdm1())
    er = eris_mod.make_eris_incore(eri_ao, mo, fock_ao, nocc)
    t1 = jnp.zeros((t2.shape[0], t2.shape[2]), t2.dtype)
    e_t = ccsd_t.kernel(t1, t2, er, tile=8)
    return float(e_corr), float(e_t), mo
