"""Device-resident GCCSD: spin-orbital CCSD on generalized (spinor) MOs.

Role of the reference cc/gccsd.py (GCCSD class, update_amps via
gintermediates): CCSD over a single spinor orbital set, the natural
correlation method on a GHF reference (scf/ghf.py) and the engine
behind G-spin validation work.  TPU-first design: the full update is ONE
fused jitted program — every contraction is a dense MXU dot_general over
device-resident antisymmetrized blocks, XLA fuses the elementwise tail,
and the host only sees the DIIS vector once per cycle.  The equations
are the Stanton et al. set, locked against the NumPy oracle
(cc/gccsd_slow.py, which also anchors this module's tests); the oracle
keeps the reference-parity role, this engine the production role.

Scale note: blocks are O(nso^4) incore; GCCSD is 16x RCCSD storage at
equal nmo, so production closed/open-shell work belongs to rccsd/uccsd —
this engine covers the generalized-reference capability the fork keeps
in cc/gccsd.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.lib import logger as lg
from pyscf_mpcc_tpu.lib.diis import DIIS


class GERIs:
    """Antisymmetrized spinor-MO blocks as device arrays + fock."""

    BLOCKS = ("oovv", "ooov", "ovvv", "oooo", "vvvv", "ovov", "ovvo",
              "ovoo", "vvvo")

    def __init__(self, blocks, fock, nocc):
        self.b = {k: jnp.asarray(v) for k, v in blocks.items()}
        self.fock = jnp.asarray(fock)
        self.nocc = int(nocc)
        self.nso = int(fock.shape[0])
        self.mo_energy = np.diag(np.asarray(fock)).copy()

    def block(self, key):
        """SpinOrbERIs-compatible accessor (the NumPy oracles in
        gccsd_slow/gccsd_t_slow consume either container)."""
        return np.asarray(self.b[key])


def make_eris_ghf(mf, frozen=0, dtype=None):
    """Spinor-MO antisymmetrized blocks from a converged GHF (or
    convert_to_ghf embedding).  ``frozen`` drops the lowest ``frozen``
    SPINORS (2x the spatial count of the R/U conventions)."""
    from pyscf_mpcc_tpu import gto
    mol = mf.mol
    nao = mol.nao
    C = np.asarray(mf.mo_coeff)[:, int(frozen):]
    occ = np.asarray(mf.mo_occ)[int(frozen):]
    # occupied spinors first (aufbau gives this already; enforce anyway)
    order = np.argsort(-occ, kind="stable")
    C = C[:, order]
    nocc = int(round(occ.sum()))
    Ca, Cb = C[:nao], C[nao:]

    eri = gto.intor_eri(mol)
    # (PQ|RS) over spinors: the spin-free AO kernel contracts the
    # spin-summed pair densities
    t = (np.einsum("pqrs,pP,qQ->PQrs", eri, Ca, Ca, optimize=True)
         + np.einsum("pqrs,pP,qQ->PQrs", eri, Cb, Cb, optimize=True))
    mo_eri = (np.einsum("PQrs,rR,sS->PQRS", t, Ca, Ca, optimize=True)
              + np.einsum("PQrs,rR,sS->PQRS", t, Cb, Cb, optimize=True))
    phys = mo_eri.transpose(0, 2, 1, 3)
    anti = phys - phys.transpose(0, 1, 3, 2)

    f_ao = mf.get_fock(mf.make_rdm1())
    fock = C.T @ f_ao @ C

    if dtype is not None:
        anti = anti.astype(dtype)
        fock = fock.astype(dtype)
    nso = C.shape[1]
    o, v = slice(0, nocc), slice(nocc, nso)
    sl = {"o": o, "v": v}
    blocks = {k: anti[tuple(sl[c] for c in k)] for k in GERIs.BLOCKS}
    return GERIs(blocks, fock, nocc)


def _denoms(fock, nocc):
    eo = jnp.diag(fock)[:nocc]
    ev = jnp.diag(fock)[nocc:]
    d1 = eo[:, None] - ev[None, :]
    d2 = (eo[:, None, None, None] + eo[None, :, None, None]
          - ev[None, None, :, None] - ev[None, None, None, :])
    return d1, d2


@partial(jax.jit, static_argnames=("nocc", "variant"))
def _update(t1, t2, b, fock, nocc, variant="ccsd"):
    """Fused Jacobi update — Stanton Eqs. (1)-(13), identical term
    structure to the oracle gccsd_slow.update_amps (:132).

    variant='qcisd' applies the QCI truncation (reference cc/qcisd.py:33,
    oracle cc/qcisd_slow.py): every T1-nonlinear term is dropped — tau
    collapses to t2, the Fae/Fmi/W intermediates keep only their t2
    bodies, and the doubles see t1 only through the linear vvvo/ovoo
    terms; Fme keeps its t1 term (the t1.t2 cross couplings survive)."""
    qci = variant == "qcisd"
    f = fock
    fov = f[:nocc, nocc:]
    foo = f[:nocc, :nocc]
    fvv = f[nocc:, nocc:]
    eo = jnp.diag(foo)
    ev = jnp.diag(fvv)
    oovv, ooov, ovvv = b["oovv"], b["ooov"], b["ovvv"]
    oooo, vvvv, ovov = b["oooo"], b["vvvv"], b["ovov"]
    ovvo, ovoo, vvvo = b["ovvo"], b["ovoo"], b["vvvo"]
    ein = jnp.einsum

    if qci:
        tau_t = tau = t2
    else:
        tau_t = t2 + 0.5 * (ein("ia,jb->ijab", t1, t1)
                            - ein("ib,ja->ijab", t1, t1))
        tau = t2 + (ein("ia,jb->ijab", t1, t1)
                    - ein("ib,ja->ijab", t1, t1))

    Fae = fvv - jnp.diag(ev)
    if not qci:
        Fae = Fae - 0.5 * ein("me,ma->ae", fov, t1)
        Fae = Fae + ein("mf,mafe->ae", t1, ovvv)
    Fae = Fae - 0.5 * ein("mnaf,mnef->ae", tau_t, oovv)

    Fmi = foo - jnp.diag(eo)
    if not qci:
        Fmi = Fmi + 0.5 * ein("ie,me->mi", t1, fov)
        Fmi = Fmi + ein("ne,mnie->mi", t1, ooov)
    Fmi = Fmi + 0.5 * ein("inef,mnef->mi", tau_t, oovv)

    Fme = fov + ein("nf,mnef->me", t1, oovv)

    Wmnij = oooo
    if not qci:
        tmp = ein("je,mnie->mnij", t1, ooov)
        Wmnij = Wmnij + tmp - tmp.transpose(0, 1, 3, 2)
    Wmnij = Wmnij + 0.25 * ein("ijef,mnef->mnij", tau, oovv)

    Wabef = vvvv
    if not qci:
        tmp = -ein("mb,maef->abef", t1, ovvv)
        Wabef = Wabef - (tmp - tmp.transpose(1, 0, 2, 3))
    Wabef = Wabef + 0.25 * ein("mnab,mnef->abef", tau, oovv)

    oovo = -ooov.transpose(0, 1, 3, 2)
    Wmbej = ovvo
    if not qci:
        Wmbej = Wmbej + ein("jf,mbef->mbej", t1, ovvv)
        Wmbej = Wmbej - ein("nb,mnej->mbej", t1, oovo)
        Wmbej = Wmbej - ein("jnfb,mnef->mbej",
                            0.5 * t2 + ein("jf,nb->jnfb", t1, t1), oovv)
    else:
        Wmbej = Wmbej - 0.5 * ein("jnfb,mnef->mbej", t2, oovv)

    t1new = fov
    t1new = t1new + ein("ie,ae->ia", t1, Fae)
    t1new = t1new - ein("ma,mi->ia", t1, Fmi)
    t1new = t1new + ein("imae,me->ia", t2, Fme)
    t1new = t1new - ein("nf,naif->ia", t1, ovov)
    t1new = t1new - 0.5 * ein("imef,maef->ia", t2, ovvv)
    t1new = t1new - 0.5 * ein("mnae,nmei->ia", t2, oovo)

    t2new = oovv
    tmp = ein("ijae,be->ijab", t2,
              Fae if qci else Fae - 0.5 * ein("mb,me->be", t1, Fme))
    t2new = t2new + tmp - tmp.transpose(0, 1, 3, 2)
    tmp = ein("imab,mj->ijab", t2,
              Fmi if qci else Fmi + 0.5 * ein("je,me->mj", t1, Fme))
    t2new = t2new - (tmp - tmp.transpose(1, 0, 2, 3))
    t2new = t2new + 0.5 * ein("mnab,mnij->ijab", tau, Wmnij)
    t2new = t2new + 0.5 * ein("ijef,abef->ijab", tau, Wabef)
    tmp = ein("imae,mbej->ijab", t2, Wmbej)
    if not qci:
        tmp = tmp - ein("ie,ma,mbej->ijab", t1, t1, ovvo)
    tmp = tmp - tmp.transpose(0, 1, 3, 2)
    t2new = t2new + tmp - tmp.transpose(1, 0, 2, 3)
    tmp = ein("ie,abej->ijab", t1, vvvo)
    t2new = t2new + tmp - tmp.transpose(1, 0, 2, 3)
    tmp = ein("ma,mbij->ijab", t1, ovoo)
    t2new = t2new - (tmp - tmp.transpose(0, 1, 3, 2))

    d1, d2 = _denoms(fock, nocc)
    return t1new / d1, t2new / d2


@partial(jax.jit, static_argnames=("nocc", "variant"))
def _energy(t1, t2, oovv, fock, nocc, variant="ccsd"):
    fov = fock[:nocc, nocc:]
    e = jnp.einsum("ia,ia->", fov, t1)
    e = e + 0.25 * jnp.einsum("ijab,ijab->", oovv, t2)
    if variant != "qcisd":      # QCI energy carries no t1^2 term
        e = e + 0.5 * jnp.einsum("ia,jb,ijab->", t1, t1, oovv)
    return e


def energy(t1, t2, eris, variant="ccsd"):
    return float(_energy(jnp.asarray(t1), jnp.asarray(t2),
                         eris.b["oovv"], eris.fock, eris.nocc,
                         variant=variant))


def init_amps(eris):
    d1, d2 = _denoms(eris.fock, eris.nocc)
    t1 = eris.fock[: eris.nocc, eris.nocc:] / d1
    t2 = eris.b["oovv"] / d2
    emp2 = 0.25 * float(jnp.einsum("ijab,ijab->", t2, eris.b["oovv"]))
    return emp2, t1, t2


def kernel(eris, max_cycle=100, conv_tol=1e-9, conv_tol_normt=1e-7,
           diis_space=6, verbose=0, t1=None, t2=None, variant="ccsd"):
    log = lg.Logger(verbose=verbose)
    emp2, t1_0, t2_0 = init_amps(eris)
    t1 = t1_0 if t1 is None else jnp.asarray(t1)
    t2 = t2_0 if t2 is None else jnp.asarray(t2)
    log.info("G%s MP2 init E_corr = %.14f", variant.upper(), emp2)
    nocc, nvir = t1.shape
    diis = DIIS(space=diis_space)
    e_last = energy(t1, t2, eris, variant=variant)
    converged = False
    e = e_last
    for it in range(max_cycle):
        t1new, t2new = _update(t1, t2, eris.b, eris.fock, eris.nocc,
                               variant=variant)
        normt = float(jnp.linalg.norm(t1new - t1)
                      + jnp.linalg.norm(t2new - t2))
        vec = np.concatenate([np.asarray(t1new).ravel(),
                              np.asarray(t2new).ravel()])
        vec = diis.update(vec)
        t1 = jnp.asarray(vec[: nocc * nvir].reshape(nocc, nvir))
        t2 = jnp.asarray(vec[nocc * nvir:].reshape(t2new.shape))
        e = energy(t1, t2, eris, variant=variant)
        log.info("cycle %2d  E_corr(GCCSD) = %.14f  dE = %9.3e  "
                 "|dt| = %9.3e", it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return float(e), t1, t2, converged


class GCCSD:
    """Driver facade: ``GCCSD(ghf_mf).run()``; mf may be a GHF or any
    R/U mean-field (auto-embedded via convert_to_ghf)."""

    conv_tol = 1e-9
    conv_tol_normt = 1e-7
    max_cycle = 100
    diis_space = 6

    def __init__(self, mf, frozen=0, verbose=None):
        from pyscf_mpcc_tpu.scf.ghf import GHF, convert_to_ghf
        if not isinstance(mf, GHF):
            mf = convert_to_ghf(mf)
        self.mf = mf
        self.frozen = int(frozen)
        self.verbose = (mf.verbose if verbose is None else verbose)
        self.converged = False
        self.e_corr = None
        self.t1 = self.t2 = None

    def run(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)
        eris = make_eris_ghf(self.mf, frozen=self.frozen)
        e, t1, t2, conv = kernel(
            eris, max_cycle=self.max_cycle, conv_tol=self.conv_tol,
            conv_tol_normt=self.conv_tol_normt,
            diis_space=self.diis_space, verbose=self.verbose)
        self.e_corr, self.t1, self.t2, self.converged = e, t1, t2, conv
        self.e_tot = float(self.mf.e_tot) + e
        return self

    kernel = run
