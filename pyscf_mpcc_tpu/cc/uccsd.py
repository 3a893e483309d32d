"""Unrestricted (spin-blocked) CCSD in JAX.

Capability match for the reference's pyscf/cc/uccsd.py:41 (update_amps) —
the UHF-CCSD equations over (t1a, t1b) and (t2aa, t2ab, t2bb), re-designed
as one fused jitted residual (no blocked HDF5 loops, no in-place buffer
reuse; every contraction a dense einsum on the MXU).  Open-shell and
non-canonical (ROHF / localized-orbital) references are handled via the
Fock-diagonal-in-denominator convention, exactly as the restricted module.

Cross-validated per-iteration against the spin-orbital textbook oracle
(cc/gccsd_slow.py) in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class UERIs(NamedTuple):
    """Chemists' MO blocks; lowercase = alpha, uppercase = beta."""
    focka: jnp.ndarray
    fockb: jnp.ndarray
    nocca: int
    noccb: int
    # same-spin alpha
    oooo: jnp.ndarray
    ovoo: jnp.ndarray
    ovov: jnp.ndarray
    oovv: jnp.ndarray
    ovvo: jnp.ndarray
    ovvv: jnp.ndarray
    vvvv: jnp.ndarray
    # same-spin beta
    OOOO: jnp.ndarray
    OVOO: jnp.ndarray
    OVOV: jnp.ndarray
    OOVV: jnp.ndarray
    OVVO: jnp.ndarray
    OVVV: jnp.ndarray
    VVVV: jnp.ndarray
    # mixed spin
    ooOO: jnp.ndarray
    ovOO: jnp.ndarray
    OVoo: jnp.ndarray
    ovOV: jnp.ndarray
    ooVV: jnp.ndarray
    OOvv: jnp.ndarray
    ovVO: jnp.ndarray
    OVvo: jnp.ndarray
    ovVV: jnp.ndarray
    OVvv: jnp.ndarray
    vvVV: jnp.ndarray

    @property
    def mo_energy(self):
        return (jnp.diagonal(self.focka), jnp.diagonal(self.fockb))


def make_eris_incore(eri_ao, mo_a, mo_b, focka_ao, fockb_ao, nocca, noccb,
                     dtype=None):
    """Build all spin blocks from AO integrals (testing / moderate sizes)."""
    from pyscf_mpcc_tpu import ao2mo
    ja = jnp.asarray(np.asarray(mo_a), dtype=dtype)
    jb = jnp.asarray(np.asarray(mo_b), dtype=dtype)
    eri = jnp.asarray(eri_ao, dtype=dtype)
    oa, va = ja[:, :nocca], ja[:, nocca:]
    ob, vb = jb[:, :noccb], jb[:, noccb:]
    g = lambda c1, c2, c3, c4: ao2mo.general(eri, (c1, c2, c3, c4))
    fa = jnp.asarray(mo_a.T @ focka_ao @ mo_a, dtype=dtype)
    fb = jnp.asarray(mo_b.T @ fockb_ao @ mo_b, dtype=dtype)
    return UERIs(
        focka=fa, fockb=fb, nocca=nocca, noccb=noccb,
        oooo=g(oa, oa, oa, oa), ovoo=g(oa, va, oa, oa),
        ovov=g(oa, va, oa, va), oovv=g(oa, oa, va, va),
        ovvo=g(oa, va, va, oa), ovvv=g(oa, va, va, va),
        vvvv=g(va, va, va, va),
        OOOO=g(ob, ob, ob, ob), OVOO=g(ob, vb, ob, ob),
        OVOV=g(ob, vb, ob, vb), OOVV=g(ob, ob, vb, vb),
        OVVO=g(ob, vb, vb, ob), OVVV=g(ob, vb, vb, vb),
        VVVV=g(vb, vb, vb, vb),
        ooOO=g(oa, oa, ob, ob), ovOO=g(oa, va, ob, ob),
        OVoo=g(ob, vb, oa, oa), ovOV=g(oa, va, ob, vb),
        ooVV=g(oa, oa, vb, vb), OOvv=g(ob, ob, va, va),
        ovVO=g(oa, va, vb, ob), OVvo=g(ob, vb, va, oa),
        ovVV=g(oa, va, vb, vb), OVvv=g(ob, vb, va, va),
        vvVV=g(va, va, vb, vb),
    )


def eris_from_scf(mf, dtype=None):
    from pyscf_mpcc_tpu import gto
    eri_ao = gto.intor_eri(mf.mol)
    dm = mf.make_rdm1()
    j, k = mf.get_jk(dm)
    h = mf.get_hcore()
    fa = h + j[0] + j[1] - k[0]
    fb = h + j[0] + j[1] - k[1]
    na, nb = mf.mol.nelec
    return make_eris_incore(eri_ao, mf.mo_coeff[0], mf.mo_coeff[1],
                            fa, fb, na, nb, dtype=dtype)


def make_tau(t2, t1, r1, fac=1.0):
    t2aa, t2ab, t2bb = t2
    t1a, t1b = t1
    r1a, r1b = r1

    def tau_ss(t2ss, x1, y1):
        t = jnp.einsum("ia,jb->ijab", x1, y1)
        t = t - t.transpose(1, 0, 2, 3)
        t = t - t.transpose(0, 1, 3, 2)
        return t2ss + fac * 0.5 * t

    tau_ab = t2ab + fac * 0.5 * (jnp.einsum("ia,jb->ijab", t1a, r1b)
                                 + jnp.einsum("ia,jb->ijab", r1a, t1b))
    return tau_ss(t2aa, t1a, r1a), tau_ab, tau_ss(t2bb, t1b, r1b)


def _nocc(eris):
    return eris.oooo.shape[0], eris.OOOO.shape[0]


def init_amps(eris: UERIs):
    na, nb = _nocc(eris)
    ea, eb = eris.mo_energy
    eia_a = ea[:na, None] - ea[None, na:]
    eia_b = eb[:nb, None] - eb[None, nb:]
    t1a = eris.focka[:na, na:] / eia_a
    t1b = eris.fockb[:nb, nb:] / eia_b
    daa = eia_a[:, None, :, None] + eia_a[None, :, None, :]
    dab = eia_a[:, None, :, None] + eia_b[None, :, None, :]
    dbb = eia_b[:, None, :, None] + eia_b[None, :, None, :]
    gaa = eris.ovov.transpose(0, 2, 1, 3) - eris.ovov.transpose(0, 2, 3, 1)
    gbb = eris.OVOV.transpose(0, 2, 1, 3) - eris.OVOV.transpose(0, 2, 3, 1)
    gab = eris.ovOV.transpose(0, 2, 1, 3)
    t2aa = gaa / daa
    t2ab = gab / dab
    t2bb = gbb / dbb
    emp2 = 0.25 * jnp.einsum("ijab,ijab->", t2aa, gaa)
    emp2 += 0.25 * jnp.einsum("ijab,ijab->", t2bb, gbb)
    emp2 += jnp.einsum("ijab,ijab->", t2ab, gab)
    return emp2, (t1a, t1b), (t2aa, t2ab, t2bb)


def energy(t1, t2, eris: UERIs):
    t1a, t1b = t1
    t2aa, t2ab, t2bb = t2
    na, nb = _nocc(eris)
    fova = eris.focka[:na, na:]
    fovb = eris.fockb[:nb, nb:]
    e = jnp.einsum("ia,ia->", fova, t1a) + jnp.einsum("ia,ia->", fovb, t1b)
    e += 0.25 * (jnp.einsum("ijab,iajb->", t2aa, eris.ovov)
                 - jnp.einsum("ijab,ibja->", t2aa, eris.ovov))
    e += 0.25 * (jnp.einsum("ijab,iajb->", t2bb, eris.OVOV)
                 - jnp.einsum("ijab,ibja->", t2bb, eris.OVOV))
    e += jnp.einsum("iJaB,iaJB->", t2ab, eris.ovOV)
    e += 0.5 * (jnp.einsum("ia,jb,iajb->", t1a, t1a, eris.ovov)
                - jnp.einsum("ia,jb,ibja->", t1a, t1a, eris.ovov))
    e += 0.5 * (jnp.einsum("ia,jb,iajb->", t1b, t1b, eris.OVOV)
                - jnp.einsum("ia,jb,ibja->", t1b, t1b, eris.OVOV))
    e += jnp.einsum("ia,jb,iajb->", t1a, t1b, eris.ovOV)
    return e


@jax.jit
def update_amps(t1, t2, eris: UERIs, level_shift=0.0):
    """One Jacobi sweep of the UHF-CCSD equations (reference uccsd.py:41)."""
    t1a, t1b = t1
    t2aa, t2ab, t2bb = t2
    na, nb = _nocc(eris)
    ea, eb = eris.mo_energy
    mo_ea_o, mo_ea_v = ea[:na], ea[na:] + level_shift
    mo_eb_o, mo_eb_v = eb[:nb], eb[nb:] + level_shift
    fova = eris.focka[:na, na:]
    fovb = eris.fockb[:nb, nb:]

    tauaa, tauab, taubb = make_tau(t2, t1, t1)

    # --- particle-particle ladders (materialized vvvv blocks) -----------
    u2aa = 0.5 * jnp.einsum("ijef,aebf->ijab", tauaa, eris.vvvv)
    u2bb = 0.5 * jnp.einsum("ijef,aebf->ijab", taubb, eris.VVVV)
    u2ab = jnp.einsum("iJeF,aeBF->iJaB", tauab, eris.vvVV)
    u1a = jnp.zeros_like(t1a)
    u1b = jnp.zeros_like(t1b)

    Fooa = 0.5 * jnp.einsum("me,ie->mi", fova, t1a) \
        + eris.focka[:na, :na] - jnp.diag(mo_ea_o)
    Foob = 0.5 * jnp.einsum("me,ie->mi", fovb, t1b) \
        + eris.fockb[:nb, :nb] - jnp.diag(mo_eb_o)
    Fvva = -0.5 * jnp.einsum("me,ma->ae", fova, t1a) \
        + eris.focka[na:, na:] - jnp.diag(mo_ea_v)
    Fvvb = -0.5 * jnp.einsum("me,ma->ae", fovb, t1b) \
        + eris.fockb[nb:, nb:] - jnp.diag(mo_eb_v)

    # --- ovvv-class terms ------------------------------------------------
    ovvv = eris.ovvv - eris.ovvv.transpose(0, 3, 2, 1)
    Fvva += jnp.einsum("mf,mfae->ae", t1a, ovvv)
    wovvo = jnp.einsum("jf,mebf->mbej", t1a, ovvv)
    u1a += 0.5 * jnp.einsum("mief,meaf->ia", t2aa, ovvv)
    u2aa += jnp.einsum("ie,mbea->imab", t1a, ovvv.conj())
    tmp1aa = jnp.einsum("ijef,mebf->ijmb", tauaa, ovvv)
    u2aa -= 0.5 * jnp.einsum("ijmb,ma->ijab", tmp1aa, t1a)

    OVVV = eris.OVVV - eris.OVVV.transpose(0, 3, 2, 1)
    Fvvb += jnp.einsum("mf,mfae->ae", t1b, OVVV)
    wOVVO = jnp.einsum("jf,mebf->mbej", t1b, OVVV)
    u1b += 0.5 * jnp.einsum("mief,meaf->ia", t2bb, OVVV)
    u2bb += jnp.einsum("ie,mbea->imab", t1b, OVVV.conj())
    tmp1bb = jnp.einsum("ijef,mebf->ijmb", taubb, OVVV)
    u2bb -= 0.5 * jnp.einsum("ijmb,ma->ijab", tmp1bb, t1b)

    ovVV = eris.ovVV
    Fvvb += jnp.einsum("mf,mfAE->AE", t1a, ovVV)
    woVvO = jnp.einsum("JF,meBF->mBeJ", t1b, ovVV)
    woVVo = jnp.einsum("jf,mfBE->mBEj", -t1a, ovVV)
    u1b += jnp.einsum("mIeF,meAF->IA", t2ab, ovVV)
    u2ab += jnp.einsum("IE,maEB->mIaB", t1b, ovVV.conj())
    tmp1ab = jnp.einsum("iJeF,meBF->iJmB", tauab, ovVV)
    u2ab -= jnp.einsum("iJmB,ma->iJaB", tmp1ab, t1a)

    OVvv = eris.OVvv
    Fvva += jnp.einsum("MF,MFae->ae", t1b, OVvv)
    wOvVo = jnp.einsum("jf,MEbf->MbEj", t1a, OVvv)
    wOvvO = jnp.einsum("JF,MFbe->MbeJ", -t1b, OVvv)
    u1a += jnp.einsum("iMfE,MEaf->ia", t2ab, OVvv)
    u2ab += jnp.einsum("ie,MBea->iMaB", t1a, OVvv.conj())
    tmp1abba = jnp.einsum("iJeF,MFbe->iJbM", tauab, OVvv)
    u2ab -= jnp.einsum("iJbM,MA->iJbA", tmp1abba, t1b)

    # --- oooo / ovoo class ----------------------------------------------
    Woooo = jnp.einsum("je,nemi->mnij", t1a, eris.ovoo)
    Woooo = Woooo - Woooo.transpose(0, 1, 3, 2)
    Woooo += eris.oooo.transpose(0, 2, 1, 3)
    Woooo += 0.5 * jnp.einsum("ijef,menf->mnij", tauaa, eris.ovov)
    u2aa += 0.5 * jnp.einsum("mnab,mnij->ijab", tauaa, Woooo)
    ovoo = eris.ovoo - eris.ovoo.transpose(2, 1, 0, 3)
    Fooa += jnp.einsum("ne,nemi->mi", t1a, ovoo)
    u1a += 0.5 * jnp.einsum("mnae,meni->ia", t2aa, ovoo)
    wovvo += jnp.einsum("nb,nemj->mbej", t1a, ovoo)

    tilaa = make_tau((t2aa, t2ab, t2bb), t1, t1, fac=0.5)[0]
    ovov = eris.ovov - eris.ovov.transpose(0, 3, 2, 1)
    Fvva -= 0.5 * jnp.einsum("mnaf,menf->ae", tilaa, ovov)
    Fooa += 0.5 * jnp.einsum("inef,menf->mi", tilaa, ovov)
    Fova = jnp.einsum("nf,menf->me", t1a, ovov)
    u2aa += 0.5 * ovov.conj().transpose(0, 2, 1, 3)
    wovvo -= 0.5 * jnp.einsum("jnfb,menf->mbej", t2aa, ovov)
    woVvO += 0.5 * jnp.einsum("nJfB,menf->mBeJ", t2ab, ovov)
    tmpaa = jnp.einsum("jf,menf->mnej", t1a, ovov)
    wovvo -= jnp.einsum("nb,mnej->mbej", t1a, tmpaa)

    WOOOO = jnp.einsum("je,nemi->mnij", t1b, eris.OVOO)
    WOOOO = WOOOO - WOOOO.transpose(0, 1, 3, 2)
    WOOOO += eris.OOOO.transpose(0, 2, 1, 3)
    WOOOO += 0.5 * jnp.einsum("ijef,menf->mnij", taubb, eris.OVOV)
    u2bb += 0.5 * jnp.einsum("mnab,mnij->ijab", taubb, WOOOO)
    OVOO = eris.OVOO - eris.OVOO.transpose(2, 1, 0, 3)
    Foob += jnp.einsum("ne,nemi->mi", t1b, OVOO)
    u1b += 0.5 * jnp.einsum("mnae,meni->ia", t2bb, OVOO)
    wOVVO += jnp.einsum("nb,nemj->mbej", t1b, OVOO)

    tilbb = make_tau((t2aa, t2ab, t2bb), t1, t1, fac=0.5)[2]
    OVOV = eris.OVOV - eris.OVOV.transpose(0, 3, 2, 1)
    Fvvb -= 0.5 * jnp.einsum("mnaf,menf->ae", tilbb, OVOV)
    Foob += 0.5 * jnp.einsum("inef,menf->mi", tilbb, OVOV)
    Fovb = jnp.einsum("nf,menf->me", t1b, OVOV)
    u2bb += 0.5 * OVOV.conj().transpose(0, 2, 1, 3)
    wOVVO -= 0.5 * jnp.einsum("jnfb,menf->mbej", t2bb, OVOV)
    wOvVo += 0.5 * jnp.einsum("jNbF,MENF->MbEj", t2ab, OVOV)
    tmpbb = jnp.einsum("jf,menf->mnej", t1b, OVOV)
    wOVVO -= jnp.einsum("nb,mnej->mbej", t1b, tmpbb)

    Fooa += jnp.einsum("NE,NEmi->mi", t1b, eris.OVoo)
    u1a -= jnp.einsum("nMaE,MEni->ia", t2ab, eris.OVoo)
    wOvVo -= jnp.einsum("nb,MEnj->MbEj", t1a, eris.OVoo)
    woVVo += jnp.einsum("NB,NEmj->mBEj", t1b, eris.OVoo)
    Foob += jnp.einsum("ne,neMI->MI", t1a, eris.ovOO)
    u1b -= jnp.einsum("mNeA,meNI->IA", t2ab, eris.ovOO)
    woVvO -= jnp.einsum("NB,meNJ->mBeJ", t1b, eris.ovOO)
    wOvvO += jnp.einsum("nb,neMJ->MbeJ", t1a, eris.ovOO)
    WoOoO = jnp.einsum("JE,NEmi->mNiJ", t1b, eris.OVoo)
    WoOoO += jnp.einsum("je,neMI->nMjI", t1a, eris.ovOO)
    WoOoO += eris.ooOO.transpose(0, 2, 1, 3)

    ovOV = eris.ovOV
    WoOoO += jnp.einsum("iJeF,meNF->mNiJ", tauab, ovOV)
    u2ab += jnp.einsum("mNaB,mNiJ->iJaB", tauab, WoOoO)

    tilab = make_tau((t2aa, t2ab, t2bb), t1, t1, fac=0.5)[1]
    Fvva -= jnp.einsum("mNaF,meNF->ae", tilab, ovOV)
    Fvvb -= jnp.einsum("nMfA,nfME->AE", tilab, ovOV)
    Fooa += jnp.einsum("iNeF,meNF->mi", tilab, ovOV)
    Foob += jnp.einsum("nIfE,nfME->MI", tilab, ovOV)
    Fova += jnp.einsum("NF,meNF->me", t1b, ovOV)
    Fovb += jnp.einsum("nf,nfME->ME", t1a, ovOV)
    u2ab += ovOV.conj().transpose(0, 2, 1, 3)
    wovvo += 0.5 * jnp.einsum("jNbF,meNF->mbej", t2ab, ovOV)
    wOVVO += 0.5 * jnp.einsum("nJfB,nfME->MBEJ", t2ab, ovOV)
    wOvVo -= 0.5 * jnp.einsum("jnfb,nfME->MbEj", t2aa, ovOV)
    woVvO -= 0.5 * jnp.einsum("JNFB,meNF->mBeJ", t2bb, ovOV)
    woVVo += 0.5 * jnp.einsum("jNfB,mfNE->mBEj", t2ab, ovOV)
    wOvvO += 0.5 * jnp.einsum("nJbF,neMF->MbeJ", t2ab, ovOV)
    tmpabab = jnp.einsum("JF,meNF->mNeJ", t1b, ovOV)
    tmpbaba = jnp.einsum("jf,nfME->MnEj", t1a, ovOV)
    woVvO -= jnp.einsum("NB,mNeJ->mBeJ", t1b, tmpabab)
    wOvVo -= jnp.einsum("nb,MnEj->MbEj", t1a, tmpbaba)
    woVVo += jnp.einsum("NB,NmEj->mBEj", t1b, tmpbaba)
    wOvvO += jnp.einsum("nb,nMeJ->MbeJ", t1a, tmpabab)

    # --- T1 ---------------------------------------------------------------
    Fova += fova
    Fovb += fovb
    u1a += fova.conj()
    u1a += jnp.einsum("ie,ae->ia", t1a, Fvva)
    u1a -= jnp.einsum("ma,mi->ia", t1a, Fooa)
    u1a -= jnp.einsum("imea,me->ia", t2aa, Fova)
    u1a += jnp.einsum("iMaE,ME->ia", t2ab, Fovb)
    u1b += fovb.conj()
    u1b += jnp.einsum("ie,ae->ia", t1b, Fvvb)
    u1b -= jnp.einsum("ma,mi->ia", t1b, Foob)
    u1b -= jnp.einsum("imea,me->ia", t2bb, Fovb)
    u1b += jnp.einsum("mIeA,me->IA", t2ab, Fova)

    # --- oovv / ovvo class ------------------------------------------------
    wovvo -= eris.oovv.transpose(0, 2, 3, 1)
    wovvo += eris.ovvo.transpose(0, 2, 1, 3)
    oovv_a = eris.oovv - eris.ovvo.transpose(0, 3, 2, 1)
    u1a -= jnp.einsum("nf,niaf->ia", t1a, oovv_a)
    tmp1aa = jnp.einsum("ie,mjbe->mbij", t1a, oovv_a)
    u2aa += 2.0 * jnp.einsum("ma,mbij->ijab", t1a, tmp1aa)

    wOVVO -= eris.OOVV.transpose(0, 2, 3, 1)
    wOVVO += eris.OVVO.transpose(0, 2, 1, 3)
    OOVV_b = eris.OOVV - eris.OVVO.transpose(0, 3, 2, 1)
    u1b -= jnp.einsum("nf,niaf->ia", t1b, OOVV_b)
    tmp1bb = jnp.einsum("ie,mjbe->mbij", t1b, OOVV_b)
    u2bb += 2.0 * jnp.einsum("ma,mbij->ijab", t1b, tmp1bb)

    woVVo -= eris.ooVV.transpose(0, 2, 3, 1)
    woVvO += eris.ovVO.transpose(0, 2, 1, 3)
    u1b += jnp.einsum("nf,nfAI->IA", t1a, eris.ovVO)
    tmp1ab = jnp.einsum("ie,meBJ->mBiJ", t1a, eris.ovVO)
    tmp1ab += jnp.einsum("IE,mjBE->mBjI", t1b, eris.ooVV)
    u2ab -= jnp.einsum("ma,mBiJ->iJaB", t1a, tmp1ab)

    wOvvO -= eris.OOvv.transpose(0, 2, 3, 1)
    wOvVo += eris.OVvo.transpose(0, 2, 1, 3)
    u1a += jnp.einsum("NF,NFai->ia", t1b, eris.OVvo)
    tmp1ba = jnp.einsum("IE,MEbj->MbIj", t1b, eris.OVvo)
    tmp1ba += jnp.einsum("ie,MJbe->MbJi", t1a, eris.OOvv)
    u2ab -= jnp.einsum("MA,MbIj->jIbA", t1b, tmp1ba)

    # --- ring terms -------------------------------------------------------
    u2aa += 2.0 * jnp.einsum("imae,mbej->ijab", t2aa, wovvo)
    u2aa += 2.0 * jnp.einsum("iMaE,MbEj->ijab", t2ab, wOvVo)
    u2bb += 2.0 * jnp.einsum("imae,mbej->ijab", t2bb, wOVVO)
    u2bb += 2.0 * jnp.einsum("mIeA,mBeJ->IJAB", t2ab, woVvO)
    u2ab += jnp.einsum("imae,mBeJ->iJaB", t2aa, woVvO)
    u2ab += jnp.einsum("iMaE,MBEJ->iJaB", t2ab, wOVVO)
    u2ab += jnp.einsum("iMeA,MbeJ->iJbA", t2ab, wOvvO)
    u2ab += jnp.einsum("IMAE,MbEj->jIbA", t2bb, wOvVo)
    u2ab += jnp.einsum("mIeA,mbej->jIbA", t2ab, wovvo)
    u2ab += jnp.einsum("mIaE,mBEj->jIaB", t2ab, woVVo)

    # --- F-intermediate closures -----------------------------------------
    Ftmpa = Fvva - 0.5 * jnp.einsum("mb,me->be", t1a, Fova)
    Ftmpb = Fvvb - 0.5 * jnp.einsum("mb,me->be", t1b, Fovb)
    u2aa += jnp.einsum("ijae,be->ijab", t2aa, Ftmpa)
    u2bb += jnp.einsum("ijae,be->ijab", t2bb, Ftmpb)
    u2ab += jnp.einsum("iJaE,BE->iJaB", t2ab, Ftmpb)
    u2ab += jnp.einsum("iJeA,be->iJbA", t2ab, Ftmpa)
    Ftmpa = Fooa + 0.5 * jnp.einsum("je,me->mj", t1a, Fova)
    Ftmpb = Foob + 0.5 * jnp.einsum("je,me->mj", t1b, Fovb)
    u2aa -= jnp.einsum("imab,mj->ijab", t2aa, Ftmpa)
    u2bb -= jnp.einsum("imab,mj->ijab", t2bb, Ftmpb)
    u2ab -= jnp.einsum("iMaB,MJ->iJaB", t2ab, Ftmpb)
    u2ab -= jnp.einsum("mIaB,mj->jIaB", t2ab, Ftmpa)

    ovoo_c = eris.ovoo.conj() - eris.ovoo.conj().transpose(2, 1, 0, 3)
    OVOO_c = eris.OVOO.conj() - eris.OVOO.conj().transpose(2, 1, 0, 3)
    u2aa -= jnp.einsum("ma,jbim->ijab", t1a, ovoo_c)
    u2bb -= jnp.einsum("ma,jbim->ijab", t1b, OVOO_c)
    u2ab -= jnp.einsum("ma,JBim->iJaB", t1a, eris.OVoo.conj())
    u2ab -= jnp.einsum("MA,ibJM->iJbA", t1b, eris.ovOO.conj())

    # --- antisymmetrize + denominators -----------------------------------
    u2aa *= 0.5
    u2bb *= 0.5
    u2aa = u2aa - u2aa.transpose(0, 1, 3, 2)
    u2aa = u2aa - u2aa.transpose(1, 0, 2, 3)
    u2bb = u2bb - u2bb.transpose(0, 1, 3, 2)
    u2bb = u2bb - u2bb.transpose(1, 0, 2, 3)

    eia_a = mo_ea_o[:, None] - mo_ea_v[None, :]
    eia_b = mo_eb_o[:, None] - mo_eb_v[None, :]
    u1a = u1a / eia_a
    u1b = u1b / eia_b
    u2aa = u2aa / (eia_a[:, None, :, None] + eia_a[None, :, None, :])
    u2ab = u2ab / (eia_a[:, None, :, None] + eia_b[None, :, None, :])
    u2bb = u2bb / (eia_b[:, None, :, None] + eia_b[None, :, None, :])
    return (u1a, u1b), (u2aa, u2ab, u2bb)


def amplitudes_to_vector(t1, t2):
    return jnp.concatenate([x.ravel() for x in (*t1, *t2)])


def vector_to_amplitudes(vec, shapes):
    out = []
    p = 0
    for s in shapes:
        n = int(np.prod(s))
        out.append(vec[p:p + n].reshape(s))
        p += n
    return (out[0], out[1]), (out[2], out[3], out[4])


def kernel(eris: UERIs, max_cycle=50, conv_tol=1e-8, conv_tol_normt=1e-6,
           diis_space=6, verbose=0, t1=None, t2=None, level_shift=0.0):
    """Host-driven UCCSD iteration with DIIS."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    emp2, t1_0, t2_0 = init_amps(eris)
    if t1 is None:
        t1 = t1_0
    if t2 is None:
        t2 = t2_0
    log.info("UCCSD MP2 init E_corr = %.14f", float(emp2))
    shapes = [x.shape for x in (*t1, *t2)]
    diis = DIIS(space=diis_space)
    e_last = float(energy(t1, t2, eris))
    converged = False
    upd = update_amps
    if type(eris).__name__ == "UERIsDF":
        from pyscf_mpcc_tpu.cc import uccsd_df
        upd = uccsd_df.update_amps
    for it in range(max_cycle):
        t1new, t2new = upd(t1, t2, eris, level_shift)
        normt = sum(float(jnp.linalg.norm(a - b))
                    for a, b in zip((*t1new, *t2new), (*t1, *t2)))
        vec = np.asarray(amplitudes_to_vector(t1new, t2new))
        vec = diis.update(vec)
        t1, t2 = vector_to_amplitudes(jnp.asarray(vec), shapes)
        e = float(energy(t1, t2, eris))
        log.info("cycle %2d  E_corr(UCCSD) = %.14f  dE = %10.3e  |dt| = %9.3e",
                 it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return converged, e, t1, t2


def to_spin_orbital(t1, t2, nocc):
    """Map spin-blocked UCCSD amplitudes to spin-orbital form
    (order [occ_a, occ_b, vir_a, vir_b], antisymmetry completed)."""
    t1a, t1b = (np.asarray(x) for x in t1)
    t2aa, t2ab, t2bb = (np.asarray(x) for x in t2)
    na, nb = t1a.shape[0], t1b.shape[0]
    va, vb = t1a.shape[1], t1b.shape[1]
    no, nv = na + nb, va + vb
    T1 = np.zeros((no, nv))
    T1[:na, :va] = t1a
    T1[na:, va:] = t1b
    T2 = np.zeros((no, no, nv, nv))
    T2[:na, :na, :va, :va] = t2aa
    T2[na:, na:, va:, va:] = t2bb
    T2[:na, na:, :va, va:] = t2ab
    T2[na:, :na, va:, :va] = t2ab.transpose(1, 0, 3, 2)
    T2[:na, na:, va:, :va] = -t2ab.transpose(0, 1, 3, 2)
    T2[na:, :na, :va, va:] = -t2ab.transpose(1, 0, 2, 3)
    return T1, T2
