"""Native DF-UMP2 with unrelaxed AND orbital-relaxed densities.

Role of the reference's mp/dfump2_native.py (DFUMP2, relaxed/unrelaxed
make_rdm1, natural orbitals): same AD construction as mp/dfmp2.py,
generalized to per-spin orbital rotations —

  * UMP2 Hylleraas functional  E_H = sum_ch w_ch (2 <t,g~> + <t, F t>)
    over the (aa, ab, bb) channels, stationary in t,
  * orbital gradient = jax.grad of E_H under per-spin Cayley rotations,
  * CPHF = the exact UHF-energy Hessian-vector product (jvp of grad),
    solved with CG over the stacked (za, zb) vector,
  * relaxed density = d/dh of the stationary Lagrangian.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _cayley(kv, nocc, nmo):
    K = jnp.zeros((nmo, nmo), kv.dtype)
    K = K.at[nocc:, :nocc].set(kv)
    K = K - K.T
    eye = jnp.eye(nmo, dtype=kv.dtype)
    return jnp.linalg.solve(eye - 0.5 * K, eye + 0.5 * K)


def _jk(B_ao, P):
    rho = jnp.einsum("Lrs,rs->L", B_ao, P)
    J = jnp.einsum("Lpq,L->pq", B_ao, rho)
    K = jnp.einsum("Lpr,Lqs,rs->pq", B_ao, B_ao, P)
    return J, K


def _orbs(kaps, C0s, noccs):
    return tuple(C0 @ _cayley(k, no, C0.shape[1])
                 for k, C0, no in zip(kaps, C0s, noccs))


def _e_hf(kaps, h, B_ao, C0s, noccs):
    Ca, Cb = _orbs(kaps, C0s, noccs)
    Pa = Ca[:, :noccs[0]] @ Ca[:, :noccs[0]].T
    Pb = Cb[:, :noccs[1]] @ Cb[:, :noccs[1]].T
    J, _ = _jk(B_ao, Pa + Pb)
    _, Ka = _jk(B_ao, Pa)
    _, Kb = _jk(B_ao, Pb)
    return (jnp.sum((Pa + Pb) * h)
            + 0.5 * (jnp.sum((Pa + Pb) * J)
                     - jnp.sum(Pa * Ka) - jnp.sum(Pb * Kb)))


def _e_hyl(kaps, h, B_ao, C0s, noccs, t2s):
    """UMP2 Hylleraas functional at fixed (t2aa, t2ab, t2bb)."""
    taa, tab, tbb = t2s
    Ca, Cb = _orbs(kaps, C0s, noccs)
    na, nb = noccs
    Pa = Ca[:, :na] @ Ca[:, :na].T
    Pb = Cb[:, :nb] @ Cb[:, :nb].T
    J, _ = _jk(B_ao, Pa + Pb)
    _, Ka = _jk(B_ao, Pa)
    _, Kb = _jk(B_ao, Pb)
    fa_ao = h + J - Ka
    fb_ao = h + J - Kb
    Lov_a = jnp.einsum("Lpq,pi,qa->Lia", B_ao, Ca[:, :na], Ca[:, na:])
    Lov_b = jnp.einsum("Lpq,pi,qa->Lia", B_ao, Cb[:, :nb], Cb[:, nb:])
    gaa = jnp.einsum("Lia,Ljb->ijab", Lov_a, Lov_a)
    gbb = jnp.einsum("Lia,Ljb->ijab", Lov_b, Lov_b)
    gab = jnp.einsum("Lia,Ljb->ijab", Lov_a, Lov_b)
    gaa = gaa - gaa.transpose(0, 1, 3, 2)
    gbb = gbb - gbb.transpose(0, 1, 3, 2)
    fooa = Ca[:, :na].T @ fa_ao @ Ca[:, :na]
    fvva = Ca[:, na:].T @ fa_ao @ Ca[:, na:]
    foob = Cb[:, :nb].T @ fb_ao @ Cb[:, :nb]
    fvvb = Cb[:, nb:].T @ fb_ao @ Cb[:, nb:]

    def ft(t, foo1, foo2, fvv1, fvv2):
        return (jnp.einsum("ac,ijcb->ijab", fvv1, t)
                + jnp.einsum("bc,ijac->ijab", fvv2, t)
                - jnp.einsum("ik,kjab->ijab", foo1, t)
                - jnp.einsum("jk,ikab->ijab", foo2, t))

    e = 0.25 * jnp.einsum("ijab,ijab->", taa,
                          2 * gaa + ft(taa, fooa, fooa, fvva, fvva))
    e += 0.25 * jnp.einsum("ijab,ijab->", tbb,
                           2 * gbb + ft(tbb, foob, foob, fvvb, fvvb))
    e += jnp.einsum("ijab,ijab->", tab,
                    2 * gab + ft(tab, fooa, foob, fvva, fvvb))
    return e


@partial(jax.jit, static_argnames=("na", "nb"))
def _relaxed_rdm1_ao(B_ao, Ca0, Cb0, h_ao, t2s, na, nb):
    C0s = (Ca0, Cb0)
    noccs = (na, nb)
    k0 = (jnp.zeros((Ca0.shape[1] - na, na), h_ao.dtype),
          jnp.zeros((Cb0.shape[1] - nb, nb), h_ao.dtype))

    e_hf = lambda k, h: _e_hf(k, h, B_ao, C0s, noccs)
    e_hyl = lambda k, h: _e_hyl(k, h, B_ao, C0s, noccs, t2s)

    g_hyl = jax.grad(e_hyl, argnums=0)(k0, h_ao)
    g_hf_fn = jax.grad(e_hf, argnums=0)

    def hvp(z):
        return jax.jvp(lambda k: g_hf_fn(k, h_ao), (k0,), (z,))[1]

    rhs = jax.tree.map(lambda x: -x, g_hyl)
    z, _ = jax.scipy.sparse.linalg.cg(hvp, rhs, tol=1e-10, maxiter=200)

    def lagrangian(h):
        gk = g_hf_fn(k0, h)
        return (e_hf(k0, h) + e_hyl(k0, h)
                + sum(jnp.vdot(a, b) for a, b in zip(z, gk)))

    return jax.grad(lagrangian)(h_ao)


class DFUMP2:
    """DF-UMP2 with unrelaxed/relaxed densities (reference
    dfump2_native.DFUMP2 surface, restricted to frozen=0)."""

    def __init__(self, mf, auxbasis=None):
        if getattr(mf, "with_df", None) is None:
            mf = mf.density_fit(auxbasis)
        self._scf = mf
        self.mol = mf.mol
        mo = np.asarray(mf.mo_coeff)
        moe = np.asarray(mf.mo_energy)
        if mo.ndim == 2:
            mo = np.array([mo, mo])
            moe = np.array([moe, moe])
        self.mo_coeff = mo
        self.mo_energy = moe
        self.nocc = self.mol.nelec
        self.e_corr = None
        self.t2 = None
        self._B_ao = None

    @property
    def B_ao(self):
        if self._B_ao is None:
            self._B_ao = jnp.asarray(self._scf.with_df.B_ao())
        return self._B_ao

    def kernel(self):
        na, nb = self.nocc
        t2s = []
        Ls, ens = [], []
        for s, no in ((0, na), (1, nb)):
            co = jnp.asarray(self.mo_coeff[s][:, :no])
            cv = jnp.asarray(self.mo_coeff[s][:, no:])
            Ls.append(jnp.einsum("Lpq,pi,qa->Lia", self.B_ao, co, cv))
            ens.append((jnp.asarray(self.mo_energy[s][:no]),
                        jnp.asarray(self.mo_energy[s][no:])))

        def d(e1, e2):
            return (e1[0][:, None, None, None] - e1[1][None, :, None, None]
                    + e2[0][None, None, :, None]
                    - e2[1][None, None, None, :]).transpose(0, 2, 1, 3)

        gaa = jnp.einsum("Lia,Ljb->ijab", Ls[0], Ls[0])
        gbb = jnp.einsum("Lia,Ljb->ijab", Ls[1], Ls[1])
        gab = jnp.einsum("Lia,Ljb->ijab", Ls[0], Ls[1])
        gaa = gaa - gaa.transpose(0, 1, 3, 2)
        gbb = gbb - gbb.transpose(0, 1, 3, 2)
        taa = gaa / d(ens[0], ens[0])
        tbb = gbb / d(ens[1], ens[1])
        tab = gab / d(ens[0], ens[1])
        self.t2 = (taa, tab, tbb)
        self.e_corr = float(0.25 * jnp.einsum("ijab,ijab->", taa, gaa)
                            + 0.25 * jnp.einsum("ijab,ijab->", tbb, gbb)
                            + jnp.einsum("ijab,ijab->", tab, gab))
        return self.e_corr

    def run(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)
        self.kernel()
        return self

    @property
    def e_tot(self):
        return self._scf.e_tot + self.e_corr

    def make_rdm1(self, relaxed=False, ao_repr=True):
        """Total (alpha+beta) AO density; relaxed includes the Z-vector
        orbital response."""
        if self.t2 is None:
            self.kernel()
        if not relaxed:
            taa, tab, tbb = self.t2
            na, nb = self.nocc
            dooa = -0.5 * jnp.einsum("ikab,jkab->ij", taa, taa) \
                - jnp.einsum("ikab,jkab->ij", tab, tab)
            doob = -0.5 * jnp.einsum("ikab,jkab->ij", tbb, tbb) \
                - jnp.einsum("kiab,kjab->ij", tab, tab)
            dvva = 0.5 * jnp.einsum("ijac,ijbc->ab", taa, taa) \
                + jnp.einsum("ijac,ijbc->ab", tab, tab)
            dvvb = 0.5 * jnp.einsum("ijac,ijbc->ab", tbb, tbb) \
                + jnp.einsum("ijca,ijcb->ab", tab, tab)
            out = 0.0
            for s, (doo, dvv, no) in enumerate((
                    (dooa, dvva, na), (doob, dvvb, nb))):
                C = jnp.asarray(self.mo_coeff[s])
                co, cv = C[:, :no], C[:, no:]
                out = out + co @ (jnp.eye(no) + doo) @ co.T \
                    + cv @ dvv @ cv.T
            return np.asarray(out)
        h = jnp.asarray(self._scf.get_hcore())
        return np.asarray(_relaxed_rdm1_ao(
            self.B_ao, jnp.asarray(self.mo_coeff[0]),
            jnp.asarray(self.mo_coeff[1]), h, self.t2,
            self.nocc[0], self.nocc[1]))


    def make_natorbs(self, relaxed=False):
        """(natural occupations, natural orbitals) of the spin-summed
        density (reference dfump2_native.make_natorbs role): eigenvectors
        of S^1/2 D S^1/2, most occupied first."""
        import scipy.linalg
        D = self.make_rdm1(relaxed=relaxed)
        S = np.asarray(self._scf.get_ovlp())
        w, v = scipy.linalg.eigh(S)
        s_half = (v * np.sqrt(w)) @ v.T
        s_mhalf = (v / np.sqrt(w)) @ v.T
        occ, u = np.linalg.eigh(s_half @ D @ s_half)
        return occ[::-1], s_mhalf @ u[:, ::-1]
