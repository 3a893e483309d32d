"""Moment-conserving GF-CCSD (Backhouse & Booth, arXiv:2206.13198).

Role of the reference's cc/momgfccsd.py (kernel :35, block Lanczos
:227/:324, bra/ket builders :455-576, MomGFCCSD :577): compress the
IP/EA-EOM-CCSD Green's function into a small set of poles that exactly
conserve the first 2*niter+2 spectral moments

    T_hole[n][q,p] = <Psi| (1+Lambda) e^-T aq+ e^T  (-Hbar)^n  ap |Psi>
    T_part[n][q,p] = <Psi| (1+Lambda) e^-T aq  e^T  ( Hbar)^n  ap+ |Psi>

TPU-native redesign of the moment build: the reference loops orbitals and
applies a hand-derived left matvec per Krylov step; here the moments are
assembled as T[n] = K_n E^T with K_{n+1} = -+ A K_n, where A is the SAME
jitted embedded EE-Jacobian sigma used by the Davidson IP/EA solvers
(cc/eom.py zero-interaction-orbital construction), batched over all nmo
ket vectors with jax.vmap — no separate left-hand sigma code path.
The block-Lanczos-from-moments recurrences (Hermitian and non-Hermitian)
and the pole extraction run on the host (nmo-sized matrices).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyscf_mpcc_tpu.cc import eom as eom_mod


# ------------------------------------------------------------- utilities
def _mat_sqrt(m, hermi=False):
    if hermi:
        w, v = np.linalg.eigh(m)
        w = np.where(w >= 0, w, 0.0)
        return (v * np.sqrt(w)[None]) @ v.T.conj()
    w, v = np.linalg.eig(m)
    return ((v * (w.astype(complex) ** 0.5)[None])
            @ np.linalg.inv(v))


def _mat_isqrt(m, tol=1e-16, hermi=False):
    if hermi:
        w, v = np.linalg.eigh(m)
        mask = w > tol
        w, v = w[mask], v[:, mask]
        return (v * (w ** -0.5)[None]) @ v.T.conj()
    w, v = np.linalg.eig(m)
    mask = np.abs(w) >= tol
    vinv = np.linalg.inv(v)[mask]
    w, v = w[mask], v[:, mask]
    return (v * (w.astype(complex) ** -0.5)[None]) @ vinv


def _block_tridiagonal(a, b, c=None):
    n = len(a)
    z = np.zeros_like(a[0])
    if c is None:
        c = [x.T.conj() for x in b]
    return np.block([[a[i] if i == j else b[j] if j == i - 1
                      else c[i] if i == j - 1 else z
                      for j in range(n)] for i in range(n)])


# --------------------------------------------- block Lanczos from moments
def block_lanczos(moments, hermi=True):
    """On/off-diagonal blocks of the moment-conserving block-tridiagonal
    effective Hamiltonian (reference block_lanczos_symm :227 /
    _nosymm :324).  Returns (a, b) for hermi else (a, b, c)."""
    nmo = moments.shape[-1]
    niter = (len(moments) - 2) // 2
    dtype = np.complex128
    a = np.zeros((niter + 1, nmo, nmo), dtype)
    b = np.zeros((niter, nmo, nmo), dtype)
    c = np.zeros((niter, nmo, nmo), dtype)
    t = np.zeros((len(moments), nmo, nmo), dtype)

    from collections import defaultdict
    v = defaultdict(lambda: np.zeros((nmo, nmo), dtype))
    w = defaultdict(lambda: np.zeros((nmo, nmo), dtype))
    v[0, 0] = np.eye(nmo).astype(dtype)
    w[0, 0] = np.eye(nmo).astype(dtype)

    orth = _mat_isqrt(moments[0], hermi=hermi)
    for i in range(len(moments)):
        t[i] = orth @ moments[i] @ orth
    a[0] = t[1]

    for i in range(niter):
        b2 = np.zeros((nmo, nmo), dtype)
        c2 = np.zeros((nmo, nmo), dtype)
        for j in range(i + 2):
            for l in range(i + 1):
                if hermi:
                    b2 += v[i, l].T.conj() @ t[j + l + 1] @ v[i, j - 1]
                else:
                    b2 += w[i, l] @ t[j + l + 1] @ v[i, j - 1]
                    c2 += w[i, j - 1] @ t[j + l + 1] @ v[i, l]
        b2 -= a[i] @ a[i]
        if not hermi:
            c2 -= a[i] @ a[i]
        if i:
            b2 -= (b[i - 1] if hermi else c[i - 1]) @ (b[i - 1] if hermi
                                                       else c[i - 1])
            if not hermi:
                c2 -= b[i - 1] @ b[i - 1]
        b[i] = _mat_sqrt(b2, hermi=hermi)
        binv = _mat_isqrt(b2, hermi=hermi)
        if not hermi:
            c[i] = _mat_sqrt(c2)
            cinv = _mat_isqrt(c2)
        for j in range(i + 2):
            r = v[i, j - 1] - v[i, j] @ a[i] - v[i - 1, j] @ b[i - 1]
            if hermi:
                v[i + 1, j] = r @ binv
            else:
                v[i + 1, j] = r @ cinv
                s = w[i, j - 1] - a[i] @ w[i, j] - c[i - 1] @ w[i - 1, j]
                w[i + 1, j] = binv @ s
        for j in range(i + 2):
            for l in range(i + 2):
                if hermi:
                    a[i + 1] += (v[i + 1, l].T.conj() @ t[j + l + 1]
                                 @ v[i + 1, j])
                else:
                    a[i + 1] += w[i + 1, l] @ t[j + l + 1] @ v[i + 1, j]
    if hermi:
        return a, b
    return a, b, c


def _eig_blocks(nmo, blocks, orth, hermi=True):
    if hermi:
        a, b = blocks
        h = _block_tridiagonal(a, b)
        e, u = np.linalg.eigh(h)
        vv = orth @ u[:nmo]
        return e, (vv, vv)
    a, b, c = blocks
    h = _block_tridiagonal(a, b, c)
    e, u = np.linalg.eig(h)
    vl = orth @ u[:nmo]
    vr = (np.linalg.inv(u)[:, :nmo] @ orth).T.conj()
    return e, (vl, vr)


def _lambda_to_standard(l1, l2):
    """Convert lambda_ad multipliers to the standard (pyscf) Lambda
    normalization used by the bra formulas.

    Our Lagrangian multipliers contract the *spin-adapted* residual, so
    they absorb the closed-shell metric: lam1 = 2 l1_std and
    lam2 = 2 l2_std - l2_std^T(ab).  Inverting:
    l1_std = lam1 / 2, l2_std = (2 lam2 + lam2^T(ab)) / 3.
    (Verified exact: moment0 + h.c. == the AD response 1-RDM to 2e-16.)"""
    l1 = np.asarray(l1)
    l2 = np.asarray(l2)
    return 0.5 * l1, (2.0 * l2 + l2.transpose(0, 1, 3, 2)) / 3.0


# ------------------------------------------------ bra/ket state vectors
def _hole_kets(t1, t2):
    """Rows q: coefficients of aq|Psi> in the (1h, 2h1p) basis
    (reference build_ket_hole :470)."""
    nocc, nvir = t1.shape
    nmo = nocc + nvir
    n1 = nocc
    n2 = nocc * nocc * nvir
    K = np.zeros((nmo, n1 + n2))
    K[:nocc, :nocc] = np.eye(nocc)
    K[nocc:, :nocc] = np.asarray(t1).T
    K[nocc:, nocc:] = np.asarray(t2).transpose(2, 0, 1, 3).reshape(
        nvir, n2)
    return K


def _hole_bras(t1, t2, l1, l2):
    """Rows p: left-hand vectors <Psi|(1+Lambda) e^-T aq+ e^T
    (reference build_bra_hole :486)."""
    t1 = np.asarray(t1); t2 = np.asarray(t2)
    l1 = np.asarray(l1); l2 = np.asarray(l2)
    nocc, nvir = t1.shape
    nmo = nocc + nvir
    E = np.zeros((nmo, nocc + nocc * nocc * nvir))
    for p in range(nocc):
        e1 = np.zeros(nocc)
        e1[p] = 1.0
        e1 -= l1 @ t1[p]
        tmp = 2.0 * t2[p] - t2[p].swapaxes(1, 2)
        e1 -= np.einsum("imef,mef->i", l2, tmp)
        tmp = -np.einsum("ijea,e->ija", l2, t1[p])
        e2 = 2.0 * tmp - tmp.swapaxes(0, 1)
        tmp = np.einsum("ja,i->ija", l1, np.eye(nocc)[p])
        e2 += 2.0 * tmp - tmp.swapaxes(0, 1)
        E[p] = np.concatenate([e1, e2.ravel()])
    for a in range(nvir):
        e1 = l1[:, a].copy()
        e2 = 2.0 * l2[:, :, a] - l2[:, :, :, a]
        E[nocc + a] = np.concatenate([e1, e2.ravel()])
    return E


def _part_kets(t1, t2):
    """Rows q: coefficients of aq+|Psi> in the (1p, 2p1h) basis
    (reference build_ket_part :531)."""
    t1 = np.asarray(t1); t2 = np.asarray(t2)
    nocc, nvir = t1.shape
    nmo = nocc + nvir
    n2 = nocc * nvir * nvir
    K = np.zeros((nmo, nvir + n2))
    K[:nocc, :nvir] = t1
    # ket for occupied p carries t2[p] = (j, a, b) as its 2p1h block
    K[:nocc, nvir:] = t2.reshape(nocc, -1)
    K[nocc:, :nvir] = -np.eye(nvir)
    return K


def _part_bras(t1, t2, l1, l2):
    """Rows p (reference build_bra_part :547)."""
    t1 = np.asarray(t1); t2 = np.asarray(t2)
    l1 = np.asarray(l1); l2 = np.asarray(l2)
    nocc, nvir = t1.shape
    nmo = nocc + nvir
    E = np.zeros((nmo, nvir + nocc * nvir * nvir))
    for p in range(nocc):
        e1 = -l1[p]
        e2 = -2.0 * l2[p] + l2[:, p]
        E[p] = np.concatenate([e1, e2.ravel()])
    for a in range(nvir):
        e1 = np.zeros(nvir)
        e1[a] = 1.0
        e1 -= t1[:, a] @ l1
        tmp = 2.0 * t2[:, :, :, a] - t2[:, :, a]
        e1 -= np.einsum("kmeb,kme->b", l2, tmp)
        tmp = -np.einsum("ikba,k->iab", l2, t1[:, a])
        e2 = 2.0 * tmp - tmp.swapaxes(1, 2)
        tmp = np.einsum("ib,a->iab", l1, np.eye(nvir)[a])
        e2 += 2.0 * tmp - tmp.swapaxes(1, 2)
        E[nocc + a] = np.concatenate([e1, e2.ravel()])
    return E


# --------------------------------------------------- batched EOM matvecs
def _ip_matvec_batch(t1, t2, eris, ntile=1):
    nocc, nvir = t1.shape
    t1p, t2p, erp = eom_mod._augment_virtual(t1, t2, eris)
    X = nvir
    n1 = nocc

    def one(x):
        r1 = x[:n1]
        r2 = x[n1:].reshape(nocc, nocc, nvir)
        r1p = jnp.zeros_like(t1p).at[:, X].set(r1)
        r2p = jnp.zeros_like(t2p).at[:, :, :nvir, X].set(r2)
        r2p = r2p + r2p.transpose(1, 0, 3, 2)
        s1p, s2p = eom_mod.ee_sigma(t1p, t2p, erp, r1p, r2p, ntile=ntile)
        s2p = 0.5 * (s2p + s2p.transpose(1, 0, 3, 2))
        return jnp.concatenate([s1p[:, X].ravel(),
                                s2p[:, :, :nvir, X].ravel()])

    return jax.jit(jax.vmap(one))


def _ea_matvec_batch(t1, t2, eris, ntile=1):
    nocc, nvir = t1.shape
    t1p, t2p, erp = eom_mod._augment_occupied(t1, t2, eris)
    Y = nocc
    n1 = nvir

    def one(x):
        r1 = x[:n1]
        r2 = x[n1:].reshape(nocc, nvir, nvir)
        r1p = jnp.zeros_like(t1p).at[Y, :].set(r1)
        r2p = jnp.zeros_like(t2p).at[Y, :nocc, :, :].set(r2)
        r2p = r2p + r2p.transpose(1, 0, 3, 2)
        s1p, s2p = eom_mod.ee_sigma(t1p, t2p, erp, r1p, r2p, ntile=ntile)
        s2p = 0.5 * (s2p + s2p.transpose(1, 0, 3, 2))
        return jnp.concatenate([s1p[Y, :].ravel(),
                                s2p[Y, :nocc, :, :].ravel()])

    return jax.jit(jax.vmap(one))


def build_hole_moments(t1, t2, l1, l2, eris, niter):
    """T_hole[n] = K_n E^T with K_{n+1} = -A K_n (A the IP sigma);
    equivalent to the reference's per-orbital left-matvec Krylov loop
    (momgfccsd.py:687) but batched over all nmo kets."""
    nmom = 2 * niter + 2
    l1, l2 = _lambda_to_standard(l1, l2)
    K = jnp.asarray(_hole_kets(t1, t2))
    E = jnp.asarray(_hole_bras(t1, t2, l1, l2))
    mv = _ip_matvec_batch(t1, t2, eris)
    out = []
    for n in range(nmom):
        out.append(np.asarray(K @ E.T))
        if n + 1 != nmom:
            K = -mv(K)
    return np.stack(out)


def build_part_moments(t1, t2, l1, l2, eris, niter):
    nmom = 2 * niter + 2
    l1, l2 = _lambda_to_standard(l1, l2)
    K = jnp.asarray(_part_kets(t1, t2))
    E = jnp.asarray(_part_bras(t1, t2, l1, l2))
    mv = _ea_matvec_batch(t1, t2, eris)
    out = []
    for n in range(nmom):
        out.append(-np.asarray(K @ E.T))
        if n + 1 != nmom:
            K = mv(K)
    return np.stack(out)


# ----------------------------------------------------------------- driver
class MomGFCCSD:
    """GF-CCSD via moment constraints (reference MomGFCCSD :577).

    niter: (hole, particle) block-Lanczos iteration counts; 2n+2 moments
    of each GF sector are conserved.  hermi_moments symmetrizes the
    moments; hermi_solver selects the Hermitian recurrence."""

    hermi_moments = False
    hermi_solver = False

    def __init__(self, mycc, niter=(2, 2)):
        self._cc = mycc
        self.niter = niter if np.ndim(niter) else (niter, niter)
        self.eh = self.vh = self.ep = self.vp = None

    @property
    def nmo(self):
        return self._cc.t1.shape[0] + self._cc.t1.shape[1]

    def kernel(self, hole_moments=None, part_moments=None, eris=None):
        cc = self._cc
        if cc.l1 is None:
            cc.solve_lambda()
        eris = eris or cc.eris
        if hole_moments is None:
            hole_moments = build_hole_moments(cc.t1, cc.t2, cc.l1, cc.l2,
                                              eris, self.niter[0])
        if part_moments is None:
            part_moments = build_part_moments(cc.t1, cc.t2, cc.l1, cc.l2,
                                              eris, self.niter[1])
        if self.hermi_moments:
            hole_moments = 0.5 * (hole_moments
                                  + hole_moments.swapaxes(1, 2).conj())
            part_moments = 0.5 * (part_moments
                                  + part_moments.swapaxes(1, 2).conj())
        hermi = self.hermi_solver
        for which, mom in (("h", hole_moments), ("p", part_moments)):
            blocks = block_lanczos(mom, hermi=hermi)
            orth = _mat_sqrt(mom[0], hermi=hermi)
            e, v = _eig_blocks(self.nmo, blocks, orth, hermi=hermi)
            order = np.argsort(e.real)
            e, v = e[order], (v[0][:, order], v[1][:, order])
            if which == "h":
                self.eh, self.vh = e, v
            else:
                self.ep, self.vp = e, v
        return self.eh, self.vh, self.ep, self.vp

    def moment_errors(self, moments, e, v):
        """Max relative deviation of pole-reconstructed moments."""
        errs = []
        for n in range(len(moments)):
            a = np.einsum("xk,yk,k->xy", v[0], v[1].conj(), e ** n)
            a = a / np.max(np.abs(a))
            b = moments[n] / np.max(np.abs(moments[n]))
            errs.append(np.max(np.abs(a - b)))
        return errs

    def make_rdm1(self, ao_repr=False, eris=None):
        """CCSD 1-RDM from the zeroth hole moment
        (reference make_rdm1 :767)."""
        cc = self._cc
        if cc.l1 is None:
            cc.solve_lambda()
        l1, l2 = _lambda_to_standard(cc.l1, cc.l2)
        m0 = np.asarray(_hole_kets(cc.t1, cc.t2)
                        @ _hole_bras(cc.t1, cc.t2, l1, l2).T)
        dm1 = m0 + m0.T.conj()
        if ao_repr:
            mo = np.asarray(cc.mo_coeff)[:, cc.frozen:]
            dm1 = mo @ dm1 @ mo.T.conj()
        return dm1

    def ipgfccsd(self, nroots=5, weight_tol=1e-3):
        """Lowest ionization poles (positive) + quasiparticle weights."""
        if self.eh is None:
            self.kernel()
        w = np.einsum("xk,xk->k", self.vh[0], self.vh[1].conj()).real
        mask = w > weight_tol
        e = -self.eh[mask].real
        w = w[mask]
        order = np.argsort(e)
        return e[order][:nroots], w[order][:nroots]

    def eagfccsd(self, nroots=5, weight_tol=1e-3):
        if self.ep is None:
            self.kernel()
        w = np.einsum("xk,xk->k", self.vp[0], self.vp[1].conj()).real
        mask = w > weight_tol
        return np.sort(self.ep[mask].real)[:nroots], w[mask]


    def dump_chk(self, path, key="gfccsd"):
        """Persist poles/weights (reference momgfccsd.dump_chk :797)."""
        from pyscf_mpcc_tpu.lib import chkfile
        chkfile.save(path, key, {
            "eh": np.asarray(self.eh), "ep": np.asarray(self.ep),
            "vh0": np.asarray(self.vh[0]), "vh1": np.asarray(self.vh[1]),
            "vp0": np.asarray(self.vp[0]), "vp1": np.asarray(self.vp[1]),
            "niter": np.asarray(self.niter)})

    def update_from_chk_(self, path, key="gfccsd"):
        """Reload a previously computed pole set
        (reference momgfccsd.update_from_chk_ :811)."""
        from pyscf_mpcc_tpu.lib import chkfile
        d = chkfile.load(path, key)
        self.eh, self.ep = d["eh"], d["ep"]
        self.vh = (d["vh0"], d["vh1"])
        self.vp = (d["vp0"], d["vp1"])
        return self
