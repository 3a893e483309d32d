"""DF-direct UCCSD: no materialized ovvv-class or vvvv-class blocks.

Capability match for the reference's cc/dfuccsd.py + the blocked ovvv
loops of uccsd.py:90-140, TPU-style: the four (ov|vv) families are
reconstructed from per-spin 3-center factors in occupied tiles inside a
lax.scan (static shapes, accumulator carry), and the three
particle-particle ladders are tiled DF reconstructions over the first
virtual axis.  Equations identical to cc.uccsd.update_amps (validated
against it with exact Cholesky factors in tests).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import uccsd as u


class UERIsDF(NamedTuple):
    """Small MO blocks materialized; large families left as L factors."""
    focka: jnp.ndarray
    fockb: jnp.ndarray
    # o^2 v^2-class blocks (as in UERIs)
    oooo: jnp.ndarray
    ovoo: jnp.ndarray
    ovov: jnp.ndarray
    oovv: jnp.ndarray
    ovvo: jnp.ndarray
    OOOO: jnp.ndarray
    OVOO: jnp.ndarray
    OVOV: jnp.ndarray
    OOVV: jnp.ndarray
    OVVO: jnp.ndarray
    ooOO: jnp.ndarray
    ovOO: jnp.ndarray
    OVoo: jnp.ndarray
    ovOV: jnp.ndarray
    ooVV: jnp.ndarray
    OOvv: jnp.ndarray
    ovVO: jnp.ndarray
    OVvo: jnp.ndarray
    # 3-center factors
    Lov_a: jnp.ndarray
    Lvv_a: jnp.ndarray
    Lov_b: jnp.ndarray
    Lvv_b: jnp.ndarray

    @property
    def mo_energy(self):
        return (jnp.diagonal(self.focka), jnp.diagonal(self.fockb))


def make_eris_df(b_ao, mo_a, mo_b, focka_ao, fockb_ao, nocca, noccb,
                 dtype=None):
    B = np.asarray(b_ao)
    moa = np.asarray(mo_a)
    mob = np.asarray(mo_b)
    oa, va = moa[:, :nocca], moa[:, nocca:]
    ob, vb = mob[:, :noccb], mob[:, noccb:]

    def half(c1, c2):
        t = np.einsum("Lpq,pi->Liq", B, c1, optimize=True)
        return np.einsum("Liq,qj->Lij", t, c2, optimize=True)

    Loo_a, Lov_a, Lvv_a = half(oa, oa), half(oa, va), half(va, va)
    Loo_b, Lov_b, Lvv_b = half(ob, ob), half(ob, vb), half(vb, vb)
    j = lambda x: jnp.asarray(x, dtype=dtype)
    fa = jnp.asarray(moa.T @ focka_ao @ moa, dtype=dtype)
    fb = jnp.asarray(mob.T @ fockb_ao @ mob, dtype=dtype)
    e = lambda a, b, sub: jnp.asarray(
        np.einsum(f"Lxy,Lzw->{sub}", a, b, optimize=True), dtype=dtype)
    return UERIsDF(
        focka=fa, fockb=fb,
        oooo=e(Loo_a, Loo_a, "xyzw"), ovoo=e(Lov_a, Loo_a, "xyzw"),
        ovov=e(Lov_a, Lov_a, "xyzw"), oovv=e(Loo_a, Lvv_a, "xyzw"),
        ovvo=jnp.asarray(np.einsum("Lxy,Lwz->xyzw", Lov_a, Lov_a,
                                   optimize=True), dtype=dtype),
        OOOO=e(Loo_b, Loo_b, "xyzw"), OVOO=e(Lov_b, Loo_b, "xyzw"),
        OVOV=e(Lov_b, Lov_b, "xyzw"), OOVV=e(Loo_b, Lvv_b, "xyzw"),
        OVVO=jnp.asarray(np.einsum("Lxy,Lwz->xyzw", Lov_b, Lov_b,
                                   optimize=True), dtype=dtype),
        ooOO=e(Loo_a, Loo_b, "xyzw"), ovOO=e(Lov_a, Loo_b, "xyzw"),
        OVoo=e(Lov_b, Loo_a, "xyzw"), ovOV=e(Lov_a, Lov_b, "xyzw"),
        ooVV=e(Loo_a, Lvv_b, "xyzw"), OOvv=e(Loo_b, Lvv_a, "xyzw"),
        ovVO=jnp.asarray(np.einsum("Lxy,Lwz->xyzw", Lov_a, Lov_b,
                                   optimize=True), dtype=dtype),
        OVvo=jnp.asarray(np.einsum("Lxy,Lwz->xyzw", Lov_b, Lov_a,
                                   optimize=True), dtype=dtype),
        Lov_a=j(Lov_a), Lvv_a=j(Lvv_a), Lov_b=j(Lov_b), Lvv_b=j(Lvv_b),
    )


def _ladder(tau, L1, L2, ntile):
    """sum_{L,e,f} L1[L,a,e] L2[L,b,f] tau[i,j,e,f] -> [i,j,a,b], tiled."""
    nv1 = L1.shape[1]
    ta = max(1, nv1 // ntile)
    ntile = nv1 // ta
    L1t = L1.reshape(L1.shape[0], ntile, ta, L1.shape[2]).transpose(1, 0, 2, 3)

    def tile_fn(l1):
        w = jnp.einsum("Lae,Lbf->abef", l1, L2)
        return jnp.einsum("abef,ijef->ijab", w, tau)

    out = jax.lax.map(tile_fn, L1t)
    no1, no2 = tau.shape[0], tau.shape[1]
    return out.transpose(1, 2, 0, 3, 4).reshape(no1, no2, nv1, L2.shape[1])


def _ovvv_scan(Lov, Lvv, t1_bra, body, carry, otile):
    """Scan occupied tiles of the (m e|b f) family; body(carry, m0, ovvv_m)
    with ovvv_m of shape (otile, nv_e, nv_b, nv_f)."""
    no = Lov.shape[1]
    nt = no // otile

    def step(c, it):
        m0 = it * otile
        lov = jax.lax.dynamic_slice(
            Lov, (jnp.int32(0), jnp.int32(m0), jnp.int32(0)),
            (Lov.shape[0], otile, Lov.shape[2]))
        ov = jnp.einsum("Lme,Lbf->mebf", lov, Lvv)
        return body(c, m0, ov), None

    carry, _ = jax.lax.scan(step, carry, jnp.arange(nt, dtype=jnp.int32))
    return carry


@partial(jax.jit, static_argnames=("ntile", "otile"))
def update_amps(t1, t2, eris: UERIsDF, level_shift=0.0, ntile=4, otile=1):
    """DF-direct UHF-CCSD Jacobi sweep (equations of cc.uccsd)."""
    t1a, t1b = t1
    t2aa, t2ab, t2bb = t2
    na = eris.oooo.shape[0]
    nb = eris.OOOO.shape[0]
    ea, eb = eris.mo_energy
    mo_ea_o, mo_ea_v = ea[:na], ea[na:] + level_shift
    mo_eb_o, mo_eb_v = eb[:nb], eb[nb:] + level_shift
    fova = eris.focka[:na, na:]
    fovb = eris.fockb[:nb, nb:]

    tauaa, tauab, taubb = u.make_tau(t2, t1, t1)

    # ladders (DF-tiled)
    u2aa = 0.5 * _ladder(tauaa, eris.Lvv_a, eris.Lvv_a, ntile)
    u2bb = 0.5 * _ladder(taubb, eris.Lvv_b, eris.Lvv_b, ntile)
    u2ab = _ladder(tauab, eris.Lvv_a, eris.Lvv_b, ntile)
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

    wovvo = jnp.zeros((na, t1a.shape[1], t1a.shape[1], na), t1a.dtype)
    wOVVO = jnp.zeros((nb, t1b.shape[1], t1b.shape[1], nb), t1b.dtype)
    woVvO = jnp.zeros((na, t1b.shape[1], t1a.shape[1], nb), t1a.dtype)
    woVVo = jnp.zeros((na, t1b.shape[1], t1b.shape[1], na), t1a.dtype)
    wOvVo = jnp.zeros((nb, t1a.shape[1], t1b.shape[1], na), t1a.dtype)
    wOvvO = jnp.zeros((nb, t1a.shape[1], t1a.shape[1], nb), t1a.dtype)

    # ---- aa ovvv family ---------------------------------------------------
    def body_aa(c, m0, ov):
        Fvva, wovvo, u1a, u2aa = c
        ov = ov - ov.transpose(0, 3, 2, 1)
        t1m = jax.lax.dynamic_slice(t1a, (m0, jnp.int32(0)),
                                    (ov.shape[0], t1a.shape[1]))
        t2m = jax.lax.dynamic_slice(
            t2aa, (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            (ov.shape[0],) + t2aa.shape[1:])
        Fvva = Fvva + jnp.einsum("mf,mfae->ae", t1m, ov)
        wovvo = jax.lax.dynamic_update_slice(
            wovvo, jax.lax.dynamic_slice(
                wovvo, (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                (ov.shape[0],) + wovvo.shape[1:])
            + jnp.einsum("jf,mebf->mbej", t1a, ov),
            (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        u1a = u1a + 0.5 * jnp.einsum("mief,meaf->ia", t2m, ov)
        upd = jnp.einsum("ie,mbea->imab", t1a, ov.conj())
        u2aa = u2aa + jax.lax.dynamic_update_slice(
            jnp.zeros_like(u2aa), upd.transpose(0, 1, 2, 3),
            (jnp.int32(0), m0, jnp.int32(0), jnp.int32(0)))
        tmp = jnp.einsum("ijef,mebf->ijmb", tauaa, ov)
        u2aa = u2aa - 0.5 * jnp.einsum("ijmb,ma->ijab", tmp, t1m)
        return (Fvva, wovvo, u1a, u2aa)

    Fvva, wovvo, u1a, u2aa = _ovvv_scan(
        eris.Lov_a, eris.Lvv_a, t1a, body_aa,
        (Fvva, wovvo, u1a, u2aa), otile)

    # ---- bb ovvv family ---------------------------------------------------
    def body_bb(c, m0, ov):
        Fvvb, wOVVO, u1b, u2bb = c
        ov = ov - ov.transpose(0, 3, 2, 1)
        t1m = jax.lax.dynamic_slice(t1b, (m0, jnp.int32(0)),
                                    (ov.shape[0], t1b.shape[1]))
        t2m = jax.lax.dynamic_slice(
            t2bb, (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            (ov.shape[0],) + t2bb.shape[1:])
        Fvvb = Fvvb + jnp.einsum("mf,mfae->ae", t1m, ov)
        wOVVO = jax.lax.dynamic_update_slice(
            wOVVO, jax.lax.dynamic_slice(
                wOVVO, (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                (ov.shape[0],) + wOVVO.shape[1:])
            + jnp.einsum("jf,mebf->mbej", t1b, ov),
            (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        u1b = u1b + 0.5 * jnp.einsum("mief,meaf->ia", t2m, ov)
        upd = jnp.einsum("ie,mbea->imab", t1b, ov.conj())
        u2bb = u2bb + jax.lax.dynamic_update_slice(
            jnp.zeros_like(u2bb), upd,
            (jnp.int32(0), m0, jnp.int32(0), jnp.int32(0)))
        tmp = jnp.einsum("ijef,mebf->ijmb", taubb, ov)
        u2bb = u2bb - 0.5 * jnp.einsum("ijmb,ma->ijab", tmp, t1m)
        return (Fvvb, wOVVO, u1b, u2bb)

    Fvvb, wOVVO, u1b, u2bb = _ovvv_scan(
        eris.Lov_b, eris.Lvv_b, t1b, body_bb,
        (Fvvb, wOVVO, u1b, u2bb), otile)

    # ---- ovVV family (alpha occ, beta vv) ---------------------------------
    def body_ab(c, m0, ov):
        Fvvb, woVvO, woVVo, u1b, u2ab = c
        t1m = jax.lax.dynamic_slice(t1a, (m0, jnp.int32(0)),
                                    (ov.shape[0], t1a.shape[1]))
        t2m = jax.lax.dynamic_slice(
            t2ab, (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            (ov.shape[0],) + t2ab.shape[1:])
        Fvvb = Fvvb + jnp.einsum("mf,mfAE->AE", t1m, ov)
        z = jnp.zeros_like(woVvO)
        woVvO = woVvO + jax.lax.dynamic_update_slice(
            z, jnp.einsum("JF,meBF->mBeJ", t1b, ov),
            (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        woVVo = woVVo + jax.lax.dynamic_update_slice(
            jnp.zeros_like(woVVo), jnp.einsum("jf,mfBE->mBEj", -t1a, ov),
            (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        u1b = u1b + jnp.einsum("mIeF,meAF->IA", t2m, ov)
        upd = jnp.einsum("IE,maEB->mIaB", t1b, ov.conj())
        u2ab = u2ab + jax.lax.dynamic_update_slice(
            jnp.zeros_like(u2ab), upd,
            (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        tmp = jnp.einsum("iJeF,meBF->iJmB", tauab, ov)
        u2ab = u2ab - jnp.einsum("iJmB,ma->iJaB", tmp, t1m)
        return (Fvvb, woVvO, woVVo, u1b, u2ab)

    Fvvb, woVvO, woVVo, u1b, u2ab = _ovvv_scan(
        eris.Lov_a, eris.Lvv_b, t1a, body_ab,
        (Fvvb, woVvO, woVVo, u1b, u2ab), otile)

    # ---- OVvv family (beta occ, alpha vv) ----------------------------------
    def body_ba(c, m0, ov):
        Fvva, wOvVo, wOvvO, u1a, u2ab = c
        t1m = jax.lax.dynamic_slice(t1b, (m0, jnp.int32(0)),
                                    (ov.shape[0], t1b.shape[1]))
        t2m = jax.lax.dynamic_slice(
            t2ab, (jnp.int32(0), m0, jnp.int32(0), jnp.int32(0)),
            (t2ab.shape[0], ov.shape[0]) + t2ab.shape[2:])
        Fvva = Fvva + jnp.einsum("MF,MFae->ae", t1m, ov)
        wOvVo = wOvVo + jax.lax.dynamic_update_slice(
            jnp.zeros_like(wOvVo), jnp.einsum("jf,MEbf->MbEj", t1a, ov),
            (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        wOvvO = wOvvO + jax.lax.dynamic_update_slice(
            jnp.zeros_like(wOvvO), jnp.einsum("JF,MFbe->MbeJ", -t1b, ov),
            (m0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        u1a = u1a + jnp.einsum("iMfE,MEaf->ia", t2m, ov)
        upd = jnp.einsum("ie,MBea->iMaB", t1a, ov.conj())
        u2ab = u2ab + jax.lax.dynamic_update_slice(
            jnp.zeros_like(u2ab), upd,
            (jnp.int32(0), m0, jnp.int32(0), jnp.int32(0)))
        tmp = jnp.einsum("iJeF,MFbe->iJbM", tauab, ov)
        u2ab = u2ab - jnp.einsum("iJbM,MA->iJbA", tmp, t1m)
        return (Fvva, wOvVo, wOvvO, u1a, u2ab)

    Fvva, wOvVo, wOvvO, u1a, u2ab = _ovvv_scan(
        eris.Lov_b, eris.Lvv_a, t1b, body_ba,
        (Fvva, wOvVo, wOvvO, u1a, u2ab), otile)

    # ---- everything below is identical to cc.uccsd.update_amps -----------
    Woooo = jnp.einsum("je,nemi->mnij", t1a, eris.ovoo)
    Woooo = Woooo - Woooo.transpose(0, 1, 3, 2)
    Woooo += eris.oooo.transpose(0, 2, 1, 3)
    Woooo += 0.5 * jnp.einsum("ijef,menf->mnij", tauaa, eris.ovov)
    u2aa += 0.5 * jnp.einsum("mnab,mnij->ijab", tauaa, Woooo)
    ovoo = eris.ovoo - eris.ovoo.transpose(2, 1, 0, 3)
    Fooa += jnp.einsum("ne,nemi->mi", t1a, ovoo)
    u1a += 0.5 * jnp.einsum("mnae,meni->ia", t2aa, ovoo)
    wovvo += jnp.einsum("nb,nemj->mbej", t1a, ovoo)

    tilaa = u.make_tau((t2aa, t2ab, t2bb), t1, t1, fac=0.5)[0]
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

    tilbb = u.make_tau((t2aa, t2ab, t2bb), t1, t1, fac=0.5)[2]
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

    tilab = u.make_tau((t2aa, t2ab, t2bb), t1, t1, fac=0.5)[1]
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
