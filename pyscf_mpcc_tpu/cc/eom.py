"""EOM-CCSD excitation energies (EE) via the CCSD Jacobian.

Role of the reference's pyscf/cc/eom_rccsd.py (eeccsd :977), re-designed
with functional transforms: the EE-EOM-CCSD matrix is exactly the Jacobian
of the ground-state amplitude residual,  A_{mu nu} = dR_mu / dt_nu
(linear-response CC), so the sigma vector is one jax.jvp call of the same
jitted residual used by the ground-state solver — no hand-derived
H-bar intermediates.  Davidson (lib.linalg) finds the lowest roots with
the orbital-energy-difference diagonal as preconditioner.

IP/EA sectors (ipccsd/eaccsd) operate in N+-1 spaces and need dedicated
sigma routines; planned for the next milestone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import lambda_ad, rccsd
from pyscf_mpcc_tpu.lib.linalg import davidson


@partial(jax.jit, static_argnames=("ntile",))
def ee_sigma(t1, t2, eris, r1, r2, ntile=1):
    """sigma = (dR/dt) . r at the converged amplitudes."""
    def rfun(x1, x2):
        return lambda_ad.residual(x1, x2, eris, ntile=ntile)

    _, (s1, s2) = jax.jvp(rfun, (t1, t2), (r1, r2))
    # A = dR/dt has diagonal -D = (e_a - e_i) > 0; its eigenvalues are the
    # (positive) excitation energies directly
    return s1, s2


def kernel_ee(t1, t2, eris, nroots=3, tol=1e-7, max_cycle=100, verbose=0,
              ntile=1):
    """Lowest EE-EOM-CCSD excitation energies (singlet space).

    Returns (converged, omegas, vectors)."""
    nocc, nvir = t1.shape
    n1 = nocc * nvir
    eo = np.asarray(eris.mo_energy[:nocc])
    ev = np.asarray(eris.mo_energy[nocc:])
    eia = ev[None, :] - eo[:, None]
    d2 = (eia[:, None, :, None] + eia[None, :, None, :]).transpose(0, 2, 1, 3)
    # packed diag: [r1 (i,a)], [r2 (i,j,a,b)]
    diag = np.concatenate([eia.ravel(),
                           (eia[:, None, :, None]
                            + eia[None, :, None, :]).ravel()])

    t2s = t2.shape

    def matvec(x):
        r1 = jnp.asarray(x[:n1].reshape(nocc, nvir))
        r2 = jnp.asarray(x[n1:].reshape(t2s))
        r2 = 0.5 * (r2 + r2.transpose(1, 0, 3, 2))
        s1, s2 = ee_sigma(t1, t2, eris, r1, r2, ntile=ntile)
        s2 = 0.5 * (s2 + s2.transpose(1, 0, 3, 2))
        return np.concatenate([np.asarray(s1).ravel(),
                               np.asarray(s2).ravel()])

    # initial guesses: lowest orbital-energy-difference singles
    order = np.argsort(eia.ravel())
    x0 = []
    for k in range(nroots):
        v = np.zeros(diag.size)
        v[order[k]] = 1.0
        x0.append(v)
    conv, e, vecs = davidson(matvec, x0, diag, nroots=nroots, tol=tol,
                             max_cycle=max_cycle, verbose=verbose)
    return conv, e, vecs


# ---------------------------------------------------------------------------
# unrestricted EE (spin-blocked Jacobian; includes the triplet sector)
# ---------------------------------------------------------------------------

@jax.jit
def ee_sigma_u(t1, t2, eris_u, r1, r2):
    def rfun(x1, x2):
        return lambda_ad.residual_u(x1, x2, eris_u)

    _, (s1, s2) = jax.jvp(rfun, (t1, t2), (r1, r2))
    return s1, s2


def kernel_ee_u(t1, t2, eris_u, nroots=3, tol=1e-7, max_cycle=100,
                verbose=0):
    """Lowest EE-EOM-UCCSD roots (covers singlet and triplet sectors)."""
    from pyscf_mpcc_tpu.cc import uccsd as umod
    na, nb = umod._nocc(eris_u)
    ea, eb = (np.asarray(x) for x in eris_u.mo_energy)
    eia_a = ea[None, na:] - ea[:na, None]
    eia_b = eb[None, nb:] - eb[:nb, None]
    shapes = [x.shape for x in (*t1, *t2)]
    sizes = [int(np.prod(s)) for s in shapes]
    daa = (eia_a[:, None, :, None] + eia_a[None, :, None, :])
    dab = (eia_a[:, None, :, None] + eia_b[None, :, None, :])
    dbb = (eia_b[:, None, :, None] + eia_b[None, :, None, :])
    diag = np.concatenate([eia_a.ravel(), eia_b.ravel(),
                           daa.ravel(), dab.ravel(), dbb.ravel()])

    def unpack(x):
        out, p = [], 0
        for s, n in zip(shapes, sizes):
            out.append(jnp.asarray(x[p:p + n].reshape(s)))
            p += n
        return (out[0], out[1]), (out[2], out[3], out[4])

    def matvec(x):
        r1, r2 = unpack(x)
        raa = 0.25 * (r2[0] - r2[0].transpose(1, 0, 2, 3)
                      - r2[0].transpose(0, 1, 3, 2)
                      + r2[0].transpose(1, 0, 3, 2))
        rbb = 0.25 * (r2[2] - r2[2].transpose(1, 0, 2, 3)
                      - r2[2].transpose(0, 1, 3, 2)
                      + r2[2].transpose(1, 0, 3, 2))
        s1, s2 = ee_sigma_u(t1, t2, eris_u, r1, (raa, r2[1], rbb))
        saa = 0.25 * (s2[0] - s2[0].transpose(1, 0, 2, 3)
                      - s2[0].transpose(0, 1, 3, 2)
                      + s2[0].transpose(1, 0, 3, 2))
        sbb = 0.25 * (s2[2] - s2[2].transpose(1, 0, 2, 3)
                      - s2[2].transpose(0, 1, 3, 2)
                      + s2[2].transpose(1, 0, 3, 2))
        return np.concatenate([np.asarray(v).ravel()
                               for v in (*s1, saa, s2[1], sbb)])

    n1 = na * t1[0].shape[1] + nb * t1[1].shape[1]
    order = np.argsort(diag[:n1])
    x0 = []
    for k in range(nroots):
        v = np.zeros(diag.size)
        v[order[k]] = 1.0
        x0.append(v)
    from pyscf_mpcc_tpu.lib.linalg import davidson
    conv, e, vecs = davidson(matvec, x0, diag, nroots=nroots, tol=tol,
                             max_cycle=max_cycle, verbose=verbose)
    return conv, e, vecs
