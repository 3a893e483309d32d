"""Native DF-MP2 with unrelaxed AND orbital-relaxed densities.

Role of the reference's mp/dfmp2_native.py (DFRMP2 :31, make_rdm1 :146
relaxed/unrelaxed, make_natorbs :181, SCSDFRMP2 :255, orbital gradient
:638 orbgrad_from_Gamma, CPHF :752 solve_cphf_rhf) — redesigned for
JAX/TPU: instead of hand-derived 3-RDM-like Gamma contractions and a
hand-written CPHF right-hand side, the orbital gradient is the exact
automatic derivative of the Hylleraas functional under a Cayley orbital
rotation, the CPHF operator is the exact Hessian-vector product of the
HF energy (jax.jvp of jax.grad), solved with CG, and the relaxed density
is the derivative of the full stationary Lagrangian with respect to the
one-electron Hamiltonian:

    L(h) = E_HF(kappa=0, h) + E_Hyl(kappa=0, h) + <z, dE_HF/dkappa (h)>
    gamma_relaxed(AO) = dL/dh      (exact, by construction)

E_Hyl is stationary in t2 (Hylleraas) and L is stationary in kappa (the
z-vector), so this derivative needs no amplitude or orbital response —
the classic Z-vector argument, realized with two jax.grad calls.  SCS
scaling enters through the generalized contraction
t~ = (ps+pt) t - pt t^T.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.mp import mp2 as mp2_mod


def _cayley(kappa_vo, nocc, nmo):
    """Orthogonal U = (I - K/2)^-1 (I + K/2) from the free vo block."""
    K = jnp.zeros((nmo, nmo), kappa_vo.dtype)
    K = K.at[nocc:, :nocc].set(kappa_vo)
    K = K - K.T
    eye = jnp.eye(nmo, dtype=kappa_vo.dtype)
    return jnp.linalg.solve(eye - 0.5 * K, eye + 0.5 * K)


def _jk(B_ao, P):
    rho = jnp.einsum("Lrs,rs->L", B_ao, P)
    J = jnp.einsum("Lpq,L->pq", B_ao, rho)
    K = jnp.einsum("Lpr,Lqs,rs->pq", B_ao, B_ao, P)
    return J, K


def _e_hf(kappa, h, B_ao, C0, nocc):
    C = C0 @ _cayley(kappa, nocc, C0.shape[1])
    Co = C[:, :nocc]
    P = 2.0 * Co @ Co.T
    J, K = _jk(B_ao, P)
    return (jnp.sum(P * h) + 0.5 * jnp.sum(P * J)
            - 0.25 * jnp.sum(P * K))


def _e_hyl(kappa, h, B_ao, C0, nocc, t2, ps, pt):
    """Hylleraas functional 2<t~|V> + <t~|F t> at fixed t2: stationary in
    t2, equals E_MP2 at the solution, and its kappa/h derivatives give
    the exact orbital gradient / correlation density."""
    C = C0 @ _cayley(kappa, nocc, C0.shape[1])
    Co = C[:, :nocc]
    Cv = C[:, nocc:]
    P = 2.0 * Co @ Co.T
    J, K = _jk(B_ao, P)
    f_ao = h + J - 0.5 * K
    foo = Co.T @ f_ao @ Co
    fvv = Cv.T @ f_ao @ Cv
    Lov = jnp.einsum("Lpq,pi,qa->Lia", B_ao, Co, Cv)
    V = jnp.einsum("Lia,Ljb->ijab", Lov, Lov)
    tt = (ps + pt) * t2 - pt * t2.transpose(0, 1, 3, 2)
    Ft = (jnp.einsum("ac,ijcb->ijab", fvv, t2)
          + jnp.einsum("bc,ijac->ijab", fvv, t2)
          - jnp.einsum("ik,kjab->ijab", foo, t2)
          - jnp.einsum("jk,ikab->ijab", foo, t2))
    return (2.0 * jnp.einsum("ijab,ijab->", tt, V)
            + jnp.einsum("ijab,ijab->", tt, Ft))


@partial(jax.jit, static_argnames=("nocc", "ps", "pt"))
def _relaxed_rdm1_ao(B_ao, C0, h_ao, t2, nocc, ps=1.0, pt=1.0):
    cg_tol = 1e-10
    nmo = C0.shape[1]
    nvir = nmo - nocc
    k0 = jnp.zeros((nvir, nocc), t2.dtype)

    e_hf = lambda k, h: _e_hf(k, h, B_ao, C0, nocc)
    e_hyl = lambda k, h: _e_hyl(k, h, B_ao, C0, nocc, t2, ps, pt)

    g_hyl = jax.grad(e_hyl, argnums=0)(k0, h_ao)
    g_hf_fn = jax.grad(e_hf, argnums=0)

    def hvp(z):
        return jax.jvp(lambda k: g_hf_fn(k, h_ao), (k0,), (z,))[1]

    z, _ = jax.scipy.sparse.linalg.cg(hvp, -g_hyl, tol=cg_tol, maxiter=200)

    def lagrangian(h):
        return (e_hf(k0, h) + e_hyl(k0, h)
                + jnp.vdot(z, g_hf_fn(k0, h)))

    return jax.grad(lagrangian)(h_ao)


@partial(jax.jit, static_argnames=("nocc", "nfro", "ps", "pt"))
def _relaxed_rdm1_ao_frozen(B_ao, C0, h_ao, t2, nocc, nfro, ps=1.0, pt=1.0):
    """Frozen-core relaxed density (reference dfmp2_native.py:146-181
    supports frozen; the round-3 code raised NotImplementedError).

    With a frozen core the correlation energy is no longer invariant
    under occupied-occupied rotations that mix frozen and active
    orbitals, so the plain vo Z-vector is not enough.  The constrained
    Lagrangian gains the frozen-active canonicality conditions:

        L(h) = E_HF + E_Hyl + z_vo . g_HF_vo(kappa,h) + z_fa . F_fa(kappa,h)

    where F_fa is the frozen x active-occ block of the MO Fock (zero for
    the converged canonical reference).  Stationarity in kappa over both
    blocks gives one linear system J^T z = -dE_Hyl/dkappa with J the
    constraint Jacobian -- nonsymmetric because the canonicality rows
    are not the gradient of a scalar, hence GMRES on the constraint vjp
    instead of the CG/HVP used in the no-frozen path.  All occ-occ
    (active-active) and vir-vir rotations remain multiplier-free: E_Hyl
    at stationary t2 is invariant under them.

    nocc = total occupied INCLUDING the nfro frozen; t2 spans active occ.
    """
    nmo = C0.shape[1]
    nvir = nmo - nocc
    nact = nocc - nfro

    def cayley2(kvo, kfa):
        K = jnp.zeros((nmo, nmo), kvo.dtype)
        K = K.at[nocc:, :nocc].set(kvo)
        K = K.at[:nfro, nfro:nocc].set(kfa)
        K = K - K.T
        eye = jnp.eye(nmo, dtype=kvo.dtype)
        return jnp.linalg.solve(eye - 0.5 * K, eye + 0.5 * K)

    def fock_ao(kvo, kfa, h):
        C = C0 @ cayley2(kvo, kfa)
        Co = C[:, :nocc]
        P = 2.0 * Co @ Co.T
        J, K = _jk(B_ao, P)
        return C, P, h + J - 0.5 * K

    def e_hf(kvo, kfa, h):
        C, P, f = fock_ao(kvo, kfa, h)
        return jnp.sum(P * h) + 0.5 * jnp.sum(P * (f - h))

    def e_hyl(kvo, kfa, h):
        C, P, f = fock_ao(kvo, kfa, h)
        Co = C[:, nfro:nocc]
        Cv = C[:, nocc:]
        foo = Co.T @ f @ Co
        fvv = Cv.T @ f @ Cv
        Lov = jnp.einsum("Lpq,pi,qa->Lia", B_ao, Co, Cv)
        V = jnp.einsum("Lia,Ljb->ijab", Lov, Lov)
        tt = (ps + pt) * t2 - pt * t2.transpose(0, 1, 3, 2)
        Ft = (jnp.einsum("ac,ijcb->ijab", fvv, t2)
              + jnp.einsum("bc,ijac->ijab", fvv, t2)
              - jnp.einsum("ik,kjab->ijab", foo, t2)
              - jnp.einsum("jk,ikab->ijab", foo, t2))
        return (2.0 * jnp.einsum("ijab,ijab->", tt, V)
                + jnp.einsum("ijab,ijab->", tt, Ft))

    def constraints(kvo, kfa, h):
        g_vo = jax.grad(e_hf, argnums=0)(kvo, kfa, h)
        C, P, f = fock_ao(kvo, kfa, h)
        c_fa = C[:, :nfro].T @ f @ C[:, nfro:nocc]
        return g_vo, c_fa

    k0v = jnp.zeros((nvir, nocc), t2.dtype)
    k0f = jnp.zeros((nfro, nact), t2.dtype)
    g_hyl = jax.grad(e_hyl, argnums=(0, 1))(k0v, k0f, h_ao)

    _, c_vjp = jax.vjp(lambda kv, kf: constraints(kv, kf, h_ao), k0v, k0f)
    z, _ = jax.scipy.sparse.linalg.gmres(
        lambda zz: c_vjp(zz), jax.tree.map(lambda g: -g, g_hyl),
        tol=1e-10, atol=0.0, maxiter=400)

    def lagrangian(h):
        c = constraints(k0v, k0f, h)
        return (e_hf(k0v, k0f, h) + e_hyl(k0v, k0f, h)
                + jnp.vdot(z[0], c[0]) + jnp.vdot(z[1], c[1]))

    return jax.grad(lagrangian)(h_ao)


@partial(jax.jit, static_argnames=("nocc",))
def _unrelaxed_rdm1_ao(C0, t2, nocc):
    dm_mo = mp2_mod.make_rdm1(t2, nocc)
    return jnp.einsum("pi,ij,qj->pq", C0, dm_mo, C0)


class DFRMP2:
    """DF-MP2 driver with relaxed/unrelaxed densities and natural
    orbitals (reference dfmp2_native.DFRMP2 surface)."""

    ps = 1.0
    pt = 1.0

    def __init__(self, mf, frozen=0, auxbasis=None):
        if getattr(mf, "with_df", None) is None:
            mf = mf.density_fit(auxbasis)
        self._scf = mf
        self.mol = mf.mol
        self.frozen = int(frozen or 0)
        self.nocc = mf.mol.nelectron // 2 - self.frozen
        self.mo_coeff = np.asarray(mf.mo_coeff)[:, self.frozen:]
        self.mo_energy = np.asarray(mf.mo_energy)[self.frozen:]
        self.e_corr = None
        self.t2 = None
        self._B_ao = None

    @property
    def B_ao(self):
        if self._B_ao is None:
            self._B_ao = jnp.asarray(self._scf.with_df.B_ao())
        return self._B_ao

    def kernel(self):
        C = jnp.asarray(self.mo_coeff)
        no = self.nocc
        Lov = jnp.einsum("Lpq,pi,qa->Lia", self.B_ao, C[:, :no], C[:, no:])
        eo = jnp.asarray(self.mo_energy[:no])
        ev = jnp.asarray(self.mo_energy[no:])
        e, t2 = mp2_mod.df_kernel(eo, ev, Lov)
        if (self.ps, self.pt) != (1.0, 1.0):
            ovov = jnp.einsum("Lia,Ljb->iajb", Lov, Lov)
            e_ss, e_os = mp2_mod.kernel_ss_os(eo, ev, ovov)
            e = self.ps * e_os + self.pt * e_ss
        self.e_corr = float(e)
        self.t2 = t2
        return self.e_corr

    calculate_energy = kernel

    def run(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)
        self.kernel()
        return self

    @property
    def e_tot(self):
        return self._scf.e_tot + self.e_corr

    # ------------------------------------------------------------ density
    def make_rdm1(self, relaxed=False, ao_repr=False):
        if self.t2 is None:
            self.kernel()
        C = jnp.asarray(self.mo_coeff)
        if relaxed:
            h = jnp.asarray(self._scf.get_hcore())
            if self.frozen:
                Cfull = jnp.asarray(self._scf.mo_coeff)
                dm_ao = _relaxed_rdm1_ao_frozen(
                    self.B_ao, Cfull, h, self.t2,
                    self.nocc + self.frozen, self.frozen,
                    ps=self.ps, pt=self.pt)
            else:
                dm_ao = _relaxed_rdm1_ao(self.B_ao, C, h, self.t2,
                                         self.nocc, ps=self.ps, pt=self.pt)
        else:
            dm_ao = _unrelaxed_rdm1_ao(C, self.t2, self.nocc)
        if ao_repr:
            return np.asarray(dm_ao)
        Cproj = jnp.asarray(self._scf.mo_coeff) if (relaxed and self.frozen) \
            else C
        S = jnp.asarray(self._scf.get_ovlp())
        proj = S @ Cproj
        return np.asarray(proj.T @ dm_ao @ proj)

    def make_rdm1_unrelaxed(self, ao_repr=False):
        return self.make_rdm1(relaxed=False, ao_repr=ao_repr)

    def make_rdm1_relaxed(self, ao_repr=False):
        return self.make_rdm1(relaxed=True, ao_repr=ao_repr)

    def make_natorbs(self, rdm1_mo=None, relaxed=False):
        """(natural occupations, natural orbitals), most occupied first
        (reference dfmp2_native.make_natorbs :181)."""
        dm = self.make_rdm1(relaxed=relaxed) if rdm1_mo is None else rdm1_mo
        w, v = np.linalg.eigh(np.asarray(dm))
        return w[::-1], np.asarray(self.mo_coeff) @ v[:, ::-1]


class SCSDFRMP2(DFRMP2):
    """Spin-component-scaled DF-MP2 (reference dfmp2_native.SCSDFRMP2
    :255; Grimme's ps=6/5, pt=1/3 defaults)."""

    ps = 6.0 / 5.0
    pt = 1.0 / 3.0

    def __init__(self, mf, ps=6.0 / 5.0, pt=1.0 / 3.0, frozen=0,
                 auxbasis=None):
        super().__init__(mf, frozen=frozen, auxbasis=auxbasis)
        self.ps = ps
        self.pt = pt
