"""Generalized (spin-orbital) MP2.

Full role of the reference's mp/gmp2.py (kernel :31, energy :63,
non-canonical update_amps :71, make_rdm1 :91, make_rdm2 :117, GMP2 class
:176): MP2 over antisymmetrized spin-orbital integrals, uniform for
RHF/UHF/ROHF references.  All contractions are jitted jnp einsums on the
device; the spin-orbital ERIs come from cc.gccsd_slow.eris_from_scf
(which handles the RHF/UHF/ROHF -> spin-orbital mapping and frozen
orbitals).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("nocc",))
def _canonical_t2(oovv, eo, ev, nocc):
    d = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    return oovv / d


def kernel(eris, with_t2=True):
    """(e_mp2, t2) from a cc.gccsd_slow.SpinOrbERIs container.

    t2[i,j,a,b] = <ij||ab> / (e_i + e_j - e_a - e_b);
    E = 1/4 sum <ij||ab> t2[ijab]   (reference gmp2.kernel :31).
    """
    no = eris.nocc
    ints = jnp.asarray(eris.ints)
    oovv = ints[:no, :no, no:, no:]
    eo = jnp.asarray(eris.mo_energy[:no])
    ev = jnp.asarray(eris.mo_energy[no:])
    t2 = _canonical_t2(oovv, eo, ev, no)
    e = 0.25 * jnp.einsum("ijab,ijab->", oovv, t2)
    return float(e), (t2 if with_t2 else None)


def energy(t2, eris):
    no = eris.nocc
    oovv = jnp.asarray(eris.ints)[:no, :no, no:, no:]
    return float(0.25 * jnp.einsum("ijab,ijab->", oovv, t2))


def update_amps(t2, eris):
    """One non-canonical iteration (reference gmp2.update_amps :71):
    residual with off-diagonal Fock blocks folded in, divided by the
    diagonal denominator."""
    no = eris.nocc
    ints = jnp.asarray(eris.ints)
    fock = jnp.asarray(eris.fock)
    oovv = ints[:no, :no, no:, no:]
    foo = fock[:no, :no]
    fvv = fock[no:, no:]
    eo = jnp.diag(foo)
    ev = jnp.diag(fvv)
    r = oovv.astype(t2.dtype)
    r = r + jnp.einsum("ac,ijcb->ijab", fvv - jnp.diag(ev), t2)
    r = r + jnp.einsum("bc,ijac->ijab", fvv - jnp.diag(ev), t2)
    r = r - jnp.einsum("ki,kjab->ijab", foo - jnp.diag(eo), t2)
    r = r - jnp.einsum("kj,ikab->ijab", foo - jnp.diag(eo), t2)
    d = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    return r / d


def kernel_iterative(eris, max_cycle=50, tol=1e-10):
    """Iterate the non-canonical update to self-consistency."""
    e, t2 = kernel(eris)
    for _ in range(max_cycle):
        t2new = update_amps(t2, eris)
        if float(jnp.abs(t2new - t2).max()) < tol:
            t2 = t2new
            break
        t2 = t2new
    return energy(t2, eris), t2


def make_rdm1(t2, nocc, nso):
    """Spin-orbital MP2 1-RDM, MO basis, including the HF part
    (reference gmp2.make_rdm1 :91 / _gamma1_intermediates :111)."""
    doo = -0.5 * jnp.einsum("ikab,jkab->ij", t2, t2)
    dvv = 0.5 * jnp.einsum("ijac,ijbc->ab", t2, t2)
    dm = jnp.zeros((nso, nso), t2.dtype)
    dm = dm.at[:nocc, :nocc].set(doo + jnp.eye(nocc, dtype=t2.dtype))
    dm = dm.at[nocc:, nocc:].set(dvv)
    return dm


def make_rdm2(t2, nocc, nso):
    """Spin-orbital MP2 2-RDM in physicist convention
    Gamma[p,q,r,s] = <p^+ q^+ s r> (reference gmp2.make_rdm2 :117 up to
    index ordering), normalized so that

        E_elec = sum_pq h[p,q] gamma[p,q]
                 + 1/4 sum_pqrs <pq||rs> Gamma[p,q,r,s]

    reproduces E_HF + E_MP2 exactly (unrelaxed response density; the
    O(t^4) corr x corr separable term is dropped, consistent with second
    order)."""
    dm1 = make_rdm1(t2, nocc, nso)
    dm2 = jnp.zeros((nso,) * 4, t2.dtype)
    # correlation blocks <i^+ j^+ b a> = t2[ijab] and its conjugate
    dm2 = dm2.at[:nocc, :nocc, nocc:, nocc:].set(t2)
    dm2 = dm2.at[nocc:, nocc:, :nocc, :nocc].set(
        t2.transpose(2, 3, 0, 1).conj())
    # separable part gamma_pr gamma_qs - gamma_ps gamma_qr, without the
    # (corr x corr) contribution
    hf1 = jnp.zeros((nso, nso), t2.dtype).at[:nocc, :nocc].set(
        jnp.eye(nocc, dtype=t2.dtype))
    corr1 = dm1 - hf1
    for d1, d2 in ((hf1, hf1), (corr1, hf1), (hf1, corr1)):
        dm2 = dm2 + (jnp.einsum("pr,qs->pqrs", d1, d2)
                     - jnp.einsum("ps,qr->pqrs", d1, d2))
    return dm2


class GMP2:
    """Driver object (reference gmp2.GMP2 :176): ``GMP2(mf).run()``."""

    def __init__(self, mf, frozen=0):
        from pyscf_mpcc_tpu.cc import gccsd_slow
        self._scf = mf
        self.frozen = int(frozen or 0)
        self.eris = gccsd_slow.eris_from_scf(mf, frozen=self.frozen)
        self.e_corr = None
        self.t2 = None

    def kernel(self):
        self.e_corr, self.t2 = kernel(self.eris)
        return self.e_corr, self.t2

    def run(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)
        self.kernel()
        return self

    @property
    def e_tot(self):
        return self._scf.e_tot + self.e_corr

    def make_rdm1(self):
        return np.asarray(make_rdm1(self.t2, self.eris.nocc, self.eris.nso))

    def make_rdm2(self):
        return np.asarray(make_rdm2(self.t2, self.eris.nocc, self.eris.nso))


def kernel_from_scf(mf):
    from pyscf_mpcc_tpu.cc import gccsd_slow
    return kernel(gccsd_slow.eris_from_scf(mf))
