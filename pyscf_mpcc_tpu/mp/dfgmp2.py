"""DF-GMP2: density-fitted generalized (spin-orbital) MP2.

Role of the reference's mp/dfgmp2.py (kernel :33, DFGMP2 :86,
loop_ao2mo :87): MP2 over antisymmetrized spin-orbital integrals with
the 4-index ERIs reconstructed from the DF 3-center factors instead of
transformed in core.  TPU-native design: one spin-orbital ``Lov``
tensor (naux, nocc_so, nvir_so) with the spin delta built in (entries
vanish when occ/vir spins differ), assembled by two MXU dot_generals
per spin channel; the antisymmetrized physicists' <ij||ab> block and
canonical t2 then come from a single jitted einsum chain -- no per-ij
host loop, no packed buffers (the reference streams naux blocks through
_ao2mo.nr_e2 because it is RAM-bound; on TPU the factors live in HBM).

Parity: pinned against the reference's own dfgmp2 running on injected
identical DF factors (tools/pin_reference_values.py::dfgmp2), and
cross-validated against our incore GMP2 on DF-reconstructed AO ERIs
(exact to fp64 roundoff).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.mp import gmp2 as gmp2_mod


@partial(jax.jit, static_argnames=("nocc",))
def _kernel_from_Lov(Lov, eo, ev, nocc):
    """(e_corr, t2) from the spin-orbital DF factor.

    <ij||ab> = (ia|jb) - (ib|ja),  (ia|jb) = sum_L Lov[Lia] Lov[Ljb];
    t2 = <ij||ab>/D;  E = 1/4 <ij||ab> t2  (reference dfgmp2.kernel :33).
    """
    ovov = jnp.einsum("Lia,Ljb->iajb", Lov, Lov)
    anti = ovov.transpose(0, 2, 1, 3) - ovov.transpose(0, 2, 3, 1)
    d = (eo[:, None, None, None] + eo[None, :, None, None]
         - ev[None, None, :, None] - ev[None, None, None, :])
    t2 = anti / d
    return 0.25 * jnp.einsum("ijab,ijab->", anti, t2), t2


def spinorb_Lov(B_ao, mo_a, mo_b, nelec, frozen=0):
    """Spin-orbital DF factor Lov (naux, no, nv) with spin deltas.

    Spin-orbital ordering matches cc.gccsd_slow.build_eris
    ([occ_a, occ_b, vir_a, vir_b]); ``frozen`` drops the lowest
    ``frozen`` spatial orbitals per spin."""
    na, nb = nelec
    na, nb = na - frozen, nb - frozen
    mo_a = jnp.asarray(mo_a)[:, frozen:]
    mo_b = jnp.asarray(mo_b)[:, frozen:]
    B = jnp.asarray(B_ao)
    nmo = mo_a.shape[1]
    naux = B.shape[0]
    no, nv = na + nb, 2 * nmo - na - nb
    La = jnp.einsum("Lpq,pi,qa->Lia", B, mo_a[:, :na], mo_a[:, na:])
    Lb = jnp.einsum("Lpq,pi,qa->Lia", B, mo_b[:, :nb], mo_b[:, nb:])
    Lov = jnp.zeros((naux, no, nv), La.dtype)
    Lov = Lov.at[:, :na, :nmo - na].set(La)
    Lov = Lov.at[:, na:, nmo - na:].set(Lb)
    return Lov


class DFGMP2:
    """Driver (reference dfgmp2.DFGMP2 :86): ``DFGMP2(mf).run()``.

    Accepts RHF/UHF/ROHF mean fields (GHF references decompose into the
    same two spin channels); requires or creates a density-fitted mf.
    RDMs reuse the spin-orbital gmp2 builders (reference dfgmp2
    delegates to gmp2.make_rdm1/2 the same way, :153-163)."""

    def __init__(self, mf, frozen=0, auxbasis=None):
        if getattr(mf, "with_df", None) is None:
            mf = mf.density_fit(auxbasis)
        self._scf = mf
        self.frozen = int(frozen or 0)
        self.e_corr = None
        self.t2 = None
        mo = np.asarray(mf.mo_coeff)
        if mo.ndim == 2:                      # RHF / ROHF spatial orbitals
            self._mo_ab = (mo, mo)
        else:                                 # UHF
            self._mo_ab = (mo[0], mo[1])
        self._nelec = mf.mol.nelec
        self.nocc = sum(self._nelec) - 2 * self.frozen

    def _energies_so(self):
        """Spin-orbital orbital energies in [occ_a, occ_b, vir_a, vir_b]
        order, from the converged SCF's own mo_energy (the reference
        dfgmp2 uses eris.mo_energy the same way -- NOT a re-derived
        Fock, which would differ once the J/K builder is density
        fitted)."""
        me = np.asarray(self._scf.mo_energy)
        if me.ndim == 1:
            ea = eb = me[self.frozen:]
        else:
            ea, eb = me[0][self.frozen:], me[1][self.frozen:]
        na, nb = (n - self.frozen for n in self._nelec)
        return np.concatenate([ea[:na], eb[:nb], ea[na:], eb[nb:]])

    def kernel(self):
        B = self._scf.with_df.B_ao()
        Lov = spinorb_Lov(B, *self._mo_ab, self._nelec, frozen=self.frozen)
        e_so = self._energies_so()
        no = self.nocc
        e, t2 = _kernel_from_Lov(Lov, jnp.asarray(e_so[:no]),
                                 jnp.asarray(e_so[no:]), no)
        self.e_corr = float(e)
        self.t2 = t2
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
        nso = self.nocc + self.t2.shape[2]
        return np.asarray(gmp2_mod.make_rdm1(self.t2, self.nocc, nso))

    def make_rdm2(self):
        nso = self.nocc + self.t2.shape[2]
        return np.asarray(gmp2_mod.make_rdm2(self.t2, self.nocc, nso))
