"""Unrestricted CCSD: spin-orbital equations over spin-traced blocks.

Capability match for the reference's pyscf/cc/uccsd.py + cc/dfuccsd.py,
built the other way around: instead of hand-expanding every contraction
into its ~350 lines of spin cases, the update evaluates the *spin-orbital*
CCSD equations of Stanton, Gauss, Watts & Bartlett (J. Chem. Phys. 94,
4334 (1991), Eqs. (1)-(13)) — the same equations as this repo's NumPy
oracle cc/gccsd_slow.py — over (alpha, beta) blocks, with the spin sums
traced mechanically by cc/spinsum.seinsum at trace time.  XLA sees one
dense MXU einsum per surviving spin case; the physics reads like the
textbook.

The three-virtual integral classes never materialize on the production
path: the particle-particle ladder runs through t1-dressed DF factors
with explicit quadratic compensation (the design of cc/rccsd._ladder_df),
and the remaining <ov||vv>/<vv||vo> terms are factorized contractions of
the 3-center factors.  A materialized path (ovvv/vvvv blocks present)
exists for tests and small systems; both produce identical updates with
exact Cholesky factors (tests/test_uccsd_df.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc.spinsum import (ST, anti4, asym, seinsum, st_t1,
                                       st_t2, t1_st, t2_st)


class UERIs(NamedTuple):
    """Chemists' MO blocks; lowercase = alpha, uppercase = beta.

    The o^2 v^2-class blocks are always materialized.  The three-virtual
    classes come either materialized (ovvv/OVVV/ovVV/OVvv + vvvv/VVVV/vvVV,
    test path) or as per-spin 3-center DF factors (Lov_*, Lvv_*,
    production path) — exactly one of the two groups should be set.
    """
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
    # same-spin beta
    OOOO: jnp.ndarray
    OVOO: jnp.ndarray
    OVOV: jnp.ndarray
    OOVV: jnp.ndarray
    OVVO: jnp.ndarray
    # mixed spin
    ooOO: jnp.ndarray
    ovOO: jnp.ndarray
    OVoo: jnp.ndarray
    ovOV: jnp.ndarray
    ooVV: jnp.ndarray
    OOvv: jnp.ndarray
    ovVO: jnp.ndarray
    OVvo: jnp.ndarray
    # three-virtual classes, materialized (tests / small systems)
    ovvv: Optional[jnp.ndarray] = None
    OVVV: Optional[jnp.ndarray] = None
    ovVV: Optional[jnp.ndarray] = None
    OVvv: Optional[jnp.ndarray] = None
    vvvv: Optional[jnp.ndarray] = None
    VVVV: Optional[jnp.ndarray] = None
    vvVV: Optional[jnp.ndarray] = None
    # or 3-center DF factors (production)
    Lov_a: Optional[jnp.ndarray] = None
    Lvv_a: Optional[jnp.ndarray] = None
    Lov_b: Optional[jnp.ndarray] = None
    Lvv_b: Optional[jnp.ndarray] = None

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
        ovvo=g(oa, va, va, oa),
        OOOO=g(ob, ob, ob, ob), OVOO=g(ob, vb, ob, ob),
        OVOV=g(ob, vb, ob, vb), OOVV=g(ob, ob, vb, vb),
        OVVO=g(ob, vb, vb, ob),
        ooOO=g(oa, oa, ob, ob), ovOO=g(oa, va, ob, ob),
        OVoo=g(ob, vb, oa, oa), ovOV=g(oa, va, ob, vb),
        ooVV=g(oa, oa, vb, vb), OOvv=g(ob, ob, va, va),
        ovVO=g(oa, va, vb, ob), OVvo=g(ob, vb, va, oa),
        ovvv=g(oa, va, va, va), OVVV=g(ob, vb, vb, vb),
        ovVV=g(oa, va, vb, vb), OVvv=g(ob, vb, va, va),
        vvvv=g(va, va, va, va), VVVV=g(vb, vb, vb, vb),
        vvVV=g(va, va, vb, vb),
    )


def make_eris_df(b_ao, mo_a, mo_b, focka_ao, fockb_ao, nocca, noccb,
                 dtype=None):
    """DF eris: o^2 v^2 blocks materialized, 3-virtual classes as factors."""
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
    e = lambda a, b: jnp.asarray(
        np.einsum("Lxy,Lzw->xyzw", a, b, optimize=True), dtype=dtype)
    ex = lambda a, b: jnp.asarray(
        np.einsum("Lxy,Lwz->xyzw", a, b, optimize=True), dtype=dtype)
    return UERIs(
        focka=fa, fockb=fb, nocca=nocca, noccb=noccb,
        oooo=e(Loo_a, Loo_a), ovoo=e(Lov_a, Loo_a),
        ovov=e(Lov_a, Lov_a), oovv=e(Loo_a, Lvv_a), ovvo=ex(Lov_a, Lov_a),
        OOOO=e(Loo_b, Loo_b), OVOO=e(Lov_b, Loo_b),
        OVOV=e(Lov_b, Lov_b), OOVV=e(Loo_b, Lvv_b), OVVO=ex(Lov_b, Lov_b),
        ooOO=e(Loo_a, Loo_b), ovOO=e(Lov_a, Loo_b), OVoo=e(Lov_b, Loo_a),
        ovOV=e(Lov_a, Lov_b), ooVV=e(Loo_a, Lvv_b), OOvv=e(Loo_b, Lvv_a),
        ovVO=ex(Lov_a, Lov_b), OVvo=ex(Lov_b, Lov_a),
        Lov_a=j(Lov_a), Lvv_a=j(Lvv_a), Lov_b=j(Lov_b), Lvv_b=j(Lvv_b),
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


# ---------------------------------------------------------------------------
# antisymmetrized physicists' integral blocks <pq||rs> from chemists' UERIs
# ---------------------------------------------------------------------------

def _g_oovv(er):
    """<mn||ef>."""
    return anti4(er.ovov.transpose(0, 2, 1, 3),
                 er.OVOV.transpose(0, 2, 1, 3),
                 er.ovOV.transpose(0, 2, 1, 3))


def _g_oovv_dir(er):
    """Direct (me|nf) in [m,e,n,f] order (ladder quadratic compensation).

    Signatures follow storage order: the mixed block has (m,e) alpha and
    (n,f) beta, i.e. key 'aabb'."""
    return ST({"aaaa": er.ovov, "bbbb": er.OVOV, "aabb": er.ovOV,
               "bbaa": er.ovOV.transpose(2, 3, 0, 1)})


def _g_oooo(er):
    """<mn||ij>."""
    return anti4(er.oooo.transpose(0, 2, 1, 3),
                 er.OOOO.transpose(0, 2, 1, 3),
                 er.ooOO.transpose(0, 2, 1, 3))


def _g_ooov(er):
    """<mn||ie>: 3rd index occupied, 4th virtual (mixed blocks by hand)."""
    return ST({
        "aaaa": (er.ovoo.transpose(2, 0, 3, 1)
                 - er.ovoo.transpose(0, 2, 3, 1)),
        "bbbb": (er.OVOO.transpose(2, 0, 3, 1)
                 - er.OVOO.transpose(0, 2, 3, 1)),
        "abab": er.OVoo.transpose(2, 0, 3, 1),
        "baba": er.ovOO.transpose(2, 0, 3, 1),
        "abba": -er.ovOO.transpose(0, 2, 3, 1),
        "baab": -er.OVoo.transpose(0, 2, 3, 1),
    })


def _g_ovvo(er):
    """<mb||ej>: [occ, vir, vir, occ]."""
    return ST({
        "aaaa": (er.ovvo.transpose(0, 2, 1, 3)
                 - er.oovv.transpose(0, 2, 3, 1)),
        "bbbb": (er.OVVO.transpose(0, 2, 1, 3)
                 - er.OOVV.transpose(0, 2, 3, 1)),
        "abab": er.ovVO.transpose(0, 2, 1, 3),
        "baba": er.OVvo.transpose(0, 2, 1, 3),
        "abba": -er.ooVV.transpose(0, 2, 3, 1),
        "baab": -er.OOvv.transpose(0, 2, 3, 1),
    })


def _g_ovvv(er):
    """<ma||ef>: [occ, vir, vir, vir] (materialized path only)."""
    return anti4(er.ovvv.transpose(0, 2, 1, 3),
                 er.OVVV.transpose(0, 2, 1, 3),
                 er.ovVV.transpose(0, 2, 1, 3),
                 direct_ba=er.OVvv.transpose(0, 2, 1, 3))


def _g_vvvv(er):
    """<ab||ef> (materialized path only)."""
    return anti4(er.vvvv.transpose(0, 2, 1, 3),
                 er.VVVV.transpose(0, 2, 1, 3),
                 er.vvVV.transpose(0, 2, 1, 3))


def _g_vvvo(er):
    """<ab||ej>: [vir, vir, vir, occ] (materialized path only)."""
    return ST({
        "aaaa": (er.ovvv.transpose(2, 1, 3, 0)
                 - er.ovvv.transpose(1, 2, 3, 0)),
        "bbbb": (er.OVVV.transpose(2, 1, 3, 0)
                 - er.OVVV.transpose(1, 2, 3, 0)),
        "abab": er.OVvv.transpose(2, 1, 3, 0),
        "baba": er.ovVV.transpose(2, 1, 3, 0),
        "abba": -er.ovVV.transpose(1, 2, 3, 0),
        "baab": -er.OVvv.transpose(1, 2, 3, 0),
    })


# ---------------------------------------------------------------------------
# three-virtual term groups: materialized (tests) and DF-factorized paths
# ---------------------------------------------------------------------------

def _high_virtual_materialized(eris, T1, T2, tau, g_oovv):
    """ovvv/vvvv/vvvo contributions with materialized blocks.

    Returns (Fae_hi, Wmbej_hi, t1_hi, t2_hi): the <ma||ef>-class pieces of
    the SG intermediates plus the full particle-particle ladder
    0.5 tau_ijef W_abef and the P(ij) t1_ie <ab||ej> doubles term.
    """
    g_ovvv = _g_ovvv(eris)
    g_vvvv = _g_vvvv(eris)
    g_vvvo = _g_vvvo(eris)
    Fae_hi = seinsum("mf,mafe->ae", T1, g_ovvv)
    Wmbej_hi = seinsum("jf,mbef->mbej", T1, g_ovvv)
    t1_hi = -0.5 * seinsum("imef,maef->ia", T2, g_ovvv)
    Wabef = (g_vvvv
             + asym(seinsum("mb,maef->abef", T1, g_ovvv), 0, 1)
             + 0.25 * seinsum("mnab,mnef->abef", tau, g_oovv))
    t2_hi = 0.5 * seinsum("ijef,abef->ijab", tau, Wabef)
    t2_hi = t2_hi + asym(seinsum("ie,abej->ijab", T1, g_vvvo), 0, 1)
    return Fae_hi, Wmbej_hi, t1_hi, t2_hi


def _ladder_tiled(tau, L1, L2, ntile):
    """sum_{L,e,f} L1[L,a,e] L2[L,b,f] tau[i,j,e,f] -> [i,j,a,b], tiled
    over the first virtual axis so (v,v,v,v) never materializes whole.
    The tiled axis is zero-padded up to ntile * ceil(nv1/ntile): padded
    rows produce zero output rows, sliced off at the end — any
    (nvir, ntile) combination is valid.

    Same-spin blocks pass the SAME dressed factor for L1 and L2 and an
    antisymmetric tau (joint (ij)<->(ef) swap symmetric), so the
    pair-mirrored symmetric ladder applies — it halves the two dominant
    dot costs (see rccsd.pair_ladder_sym).  The opposite-spin block
    (L1 = alpha, L2 = beta) has no such symmetry and takes the generic
    path below."""
    if L1 is L2:
        from pyscf_mpcc_tpu.cc.rccsd import pair_ladder_sym
        return pair_ladder_sym(tau, L1, ntile)
    nv1 = L1.shape[1]
    ntile = max(1, min(int(ntile), nv1))
    ta = -(-nv1 // ntile)
    pad = ntile * ta - nv1
    if pad:
        L1 = jnp.pad(L1, ((0, 0), (0, pad), (0, 0)))
    L1t = L1.reshape(L1.shape[0], ntile, ta, L1.shape[2]).transpose(1, 0, 2, 3)

    def tile_fn(l1):
        w = jnp.einsum("Lae,Lbf->abef", l1, L2)
        return jnp.einsum("abef,ijef->ijab", w, tau)

    # checkpoint: under vjp (the unrestricted Lambda / RDM solvers) the
    # scan would otherwise save every tile's 4-index w block for the
    # backward pass — ~1.5 GiB/tile already at OH(H2O)3/cc-pVTZ, the
    # first-cycle OOM of the round-4 open-shell campaign.  Same fix as
    # pair_ladder_sym (which the same-spin blocks dispatch to).
    out = jax.lax.map(jax.checkpoint(tile_fn), L1t)
    no1, no2 = tau.shape[0], tau.shape[1]
    out = out.transpose(1, 2, 0, 3, 4).reshape(no1, no2, ntile * ta,
                                               L2.shape[1])
    return out[:, :, :nv1, :]


def _high_virtual_df(eris, t1, T1, T2, tau, g_oovv, g_oovv_dir, ntile):
    """The same term groups factorized through the 3-center DF factors.

    Ladder: 0.5 tau W_abef == tau.(dressed vv|vv) - quadratic compensation
    + 1/8 tau tau <mn||ef> (the W_abef quadratic evaluated in o^4 space) —
    the rccsd._ladder_df design, spin-generalized.  Everything else is a
    direct factorization (each <..|vv> contraction runs through L).
    """
    t1a, t1b = t1
    La, Ua = eris.Lov_a, eris.Lvv_a
    Lb, Ub = eris.Lov_b, eris.Lvv_b

    # ---- Fae += sum_mf t1_mf <ma||fe> -----------------------------------
    ra = jnp.einsum("Lmf,mf->L", La, t1a)
    rb = jnp.einsum("LMF,MF->L", Lb, t1b)
    xa = jnp.einsum("Lme,mf->Lef", La, t1a)
    xb = jnp.einsum("LME,MF->LEF", Lb, t1b)
    Fae_hi = ST({
        "aa": (jnp.einsum("L,Lae->ae", ra + rb, Ua)
               - jnp.einsum("Lef,Laf->ae", xa, Ua)),
        "bb": (jnp.einsum("L,LAE->AE", ra + rb, Ub)
               - jnp.einsum("LEF,LAF->AE", xb, Ub)),
    })

    # ---- Wmbej += sum_f t1_jf <mb||ef> ----------------------------------
    Yaa = jnp.einsum("Lbf,jf->Ljb", Ua, t1a)    # (vv|.)t1, alpha
    Ybb = jnp.einsum("LBF,JF->LJB", Ub, t1b)
    Zaa = jnp.einsum("Lmf,jf->Lmj", La, t1a)    # (ov|.)t1, alpha
    Zbb = jnp.einsum("LMF,JF->LMJ", Lb, t1b)
    Wmbej_hi = ST({
        "aaaa": (jnp.einsum("Lme,Ljb->mbej", La, Yaa)
                 - jnp.einsum("Lmj,Lbe->mbej", Zaa, Ua)),
        "bbbb": (jnp.einsum("LME,LJB->MBEJ", Lb, Ybb)
                 - jnp.einsum("LMJ,LBE->MBEJ", Zbb, Ub)),
        "abab": jnp.einsum("Lme,LJB->mBeJ", La, Ybb),
        "baba": jnp.einsum("LME,Ljb->MbEj", Lb, Yaa),
        "abba": -jnp.einsum("Lmj,LBE->mBEj", Zaa, Ub),
        "baab": -jnp.einsum("LMJ,Lbe->MbeJ", Zbb, Ua),
    })

    # ---- t1 += -1/2 sum_mef t2_imef <ma||ef> ----------------------------
    t2aa, t2ab, t2bb = st_t2(T2)
    Xa = jnp.einsum("imef,Lme->Lif", t2aa, La)
    Xb = jnp.einsum("IMEF,LME->LIF", t2bb, Lb)
    Zab = jnp.einsum("iMeF,LMF->Lie", t2ab, Lb)
    Zba = jnp.einsum("mIeF,Lme->LIF", t2ab, La)
    t1_hi = ST({
        "aa": (-jnp.einsum("Lif,Laf->ia", Xa, Ua)
               + jnp.einsum("Lie,Lae->ia", Zab, Ua)),
        "bb": (-jnp.einsum("LIF,LAF->IA", Xb, Ub)
               + jnp.einsum("LIF,LAF->IA", Zba, Ub)),
    })

    # ---- ladder: dressed factors, quadratic compensation ----------------
    Ua_d = Ua - jnp.einsum("Lme,ma->Lae", La, t1a)
    Ub_d = Ub - jnp.einsum("LME,MA->LAE", Lb, t1b)
    tau_aa, tau_ab, tau_bb = st_t2(tau)
    Daa = _ladder_tiled(tau_aa, Ua_d, Ua_d, ntile)
    Dbb = _ladder_tiled(tau_bb, Ub_d, Ub_d, ntile)
    Dab = _ladder_tiled(tau_ab, Ua_d, Ub_d, ntile)
    Xdir = seinsum("ijef,menf->mnij", tau, g_oovv_dir)
    Qcomp = seinsum("ma,nb,mnij->ijab", T1, T1, Xdir)
    Yanti = seinsum("ijef,mnef->mnij", tau, g_oovv)
    Wquad = 0.125 * seinsum("mnab,mnij->ijab", tau, Yanti)
    t2_hi = (ST({"aaaa": Daa, "abab": Dab, "bbbb": Dbb})
             - Qcomp + Wquad)

    # ---- t2 += P(ij) sum_e t1_ie <ab||ej> --------------------------------
    Aa = jnp.einsum("ie,Lae->Lia", t1a, Ua)     # t1-dressed (a e| rows
    Ab = jnp.einsum("IE,LAE->LIA", t1b, Ub)
    Ba = jnp.einsum("ie,Lbe->Lib", t1a, Ua)
    Bb = jnp.einsum("IE,LBE->LIB", t1b, Ub)
    vvvo = ST({
        "aaaa": (jnp.einsum("Lia,Ljb->ijab", Aa, La)
                 - jnp.einsum("Lja,Lib->ijab", La, Ba)),
        "bbbb": (jnp.einsum("LIA,LJB->IJAB", Ab, Lb)
                 - jnp.einsum("LJA,LIB->IJAB", Lb, Bb)),
        "abab": jnp.einsum("Lia,LJB->iJaB", Aa, Lb),
        "baab": -jnp.einsum("Lja,LIB->IjaB", La, Bb),
        "abba": -jnp.einsum("LJA,Lib->iJAb", Lb, Ba),
        "baba": jnp.einsum("LIA,Ljb->IjAb", Ab, La),
    })
    t2_hi = t2_hi + asym(vvvo, 0, 1)
    return Fae_hi, Wmbej_hi, t1_hi, t2_hi


# ---------------------------------------------------------------------------
# the update: Stanton-Gauss-Watts-Bartlett Eqs. (1)-(13), spin-traced
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ntile",))
def update_amps(t1, t2, eris: UERIs, level_shift=0.0, ntile=4):
    """One Jacobi sweep of the spin-orbital CCSD equations over blocks.

    Mirrors cc/gccsd_slow.update_amps line for line; each seinsum call is
    that equation's spin-orbital contraction, traced over (alpha, beta).
    """
    na, nb = _nocc(eris)
    ea, eb = eris.mo_energy
    mo_ea_o, mo_ea_v = ea[:na], ea[na:] + level_shift
    mo_eb_o, mo_eb_v = eb[:nb], eb[nb:] + level_shift

    T1 = t1_st(t1)
    T2 = t2_st(t2)
    fov = ST({"aa": eris.focka[:na, na:], "bb": eris.fockb[:nb, nb:]})
    foo_nd = ST({"aa": eris.focka[:na, :na] - jnp.diag(mo_ea_o),
                 "bb": eris.fockb[:nb, :nb] - jnp.diag(mo_eb_o)})
    fvv_nd = ST({"aa": eris.focka[na:, na:] - jnp.diag(mo_ea_v),
                 "bb": eris.fockb[nb:, nb:] - jnp.diag(mo_eb_v)})

    g_oovv = _g_oovv(eris)
    g_ooov = _g_ooov(eris)
    g_oooo = _g_oooo(eris)
    g_ovvo = _g_ovvo(eris)
    g_ovov = -1.0 * g_ovvo.transpose((0, 1, 3, 2))   # <na||if> = -<na||fi>
    g_ovoo = g_ooov.transpose((2, 3, 0, 1))          # <mb||ij> = <ij||mb>
    g_oovo = -1.0 * g_ooov.transpose((0, 1, 3, 2))   # <mn||ej> = -<mn||je>

    x = seinsum("ia,jb->ijab", T1, T1)
    tau1 = x - x.transpose((0, 1, 3, 2))
    tau_t = T2 + 0.5 * tau1
    tau = T2 + tau1

    # high-virtual (ovvv/vvvv/vvvo) term groups, factorized or materialized
    if eris.Lvv_a is not None:
        Fae_hi, Wmbej_hi, t1_hi, t2_hi = _high_virtual_df(
            eris, t1, T1, T2, tau, g_oovv, _g_oovv_dir(eris), ntile)
    else:
        Fae_hi, Wmbej_hi, t1_hi, t2_hi = _high_virtual_materialized(
            eris, T1, T2, tau, g_oovv)

    # SG Eqs. (3)-(5): one-particle intermediates
    Fae = (fvv_nd - 0.5 * seinsum("me,ma->ae", fov, T1)
           + Fae_hi - 0.5 * seinsum("mnaf,mnef->ae", tau_t, g_oovv))
    Fmi = (foo_nd + 0.5 * seinsum("ie,me->mi", T1, fov)
           + seinsum("ne,mnie->mi", T1, g_ooov)
           + 0.5 * seinsum("inef,mnef->mi", tau_t, g_oovv))
    Fme = fov + seinsum("nf,mnef->me", T1, g_oovv)

    # SG Eqs. (6), (8): two-particle intermediates
    Wmnij = (g_oooo + asym(seinsum("je,mnie->mnij", T1, g_ooov), 2, 3)
             + 0.25 * seinsum("ijef,mnef->mnij", tau, g_oovv))
    jnfb = 0.5 * T2 + seinsum("jf,nb->jnfb", T1, T1)
    Wmbej = (g_ovvo + Wmbej_hi
             - seinsum("nb,mnej->mbej", T1, g_oovo)
             - seinsum("jnfb,mnef->mbej", jnfb, g_oovv))

    # SG Eq. (1): T1
    t1new = (fov + t1_hi
             + seinsum("ie,ae->ia", T1, Fae)
             - seinsum("ma,mi->ia", T1, Fmi)
             + seinsum("imae,me->ia", T2, Fme)
             - seinsum("nf,naif->ia", T1, g_ovov)
             - 0.5 * seinsum("mnae,nmei->ia", T2, g_oovo))

    # SG Eq. (2): T2
    FaeT = Fae - 0.5 * seinsum("mb,me->be", T1, Fme)
    FmiT = Fmi + 0.5 * seinsum("je,me->mj", T1, Fme)
    ring = (seinsum("imae,mbej->ijab", T2, Wmbej)
            - seinsum("ie,ma,mbej->ijab", T1, T1, g_ovvo))
    t2new = (g_oovv + t2_hi
             + asym(seinsum("ijae,be->ijab", T2, FaeT), 2, 3)
             - asym(seinsum("imab,mj->ijab", T2, FmiT), 0, 1)
             + 0.5 * seinsum("mnab,mnij->ijab", tau, Wmnij)
             + asym(asym(ring, 2, 3), 0, 1)
             - asym(seinsum("ma,mbij->ijab", T1, g_ovoo), 2, 3))

    # denominators
    eia_a = mo_ea_o[:, None] - mo_ea_v[None, :]
    eia_b = mo_eb_o[:, None] - mo_eb_v[None, :]
    u1a = t1new["aa"] / eia_a
    u1b = t1new["bb"] / eia_b
    u2aa = t2new["aaaa"] / (eia_a[:, None, :, None]
                            + eia_a[None, :, None, :])
    u2ab = t2new["abab"] / (eia_a[:, None, :, None]
                            + eia_b[None, :, None, :])
    u2bb = t2new["bbbb"] / (eia_b[:, None, :, None]
                            + eia_b[None, :, None, :])
    return (u1a, u1b), (u2aa, u2ab, u2bb)


def amplitudes_to_vector(t1, t2):
    return jnp.concatenate([x.ravel() for x in (*t1, *t2)])


def vector_to_amplitudes(vec, shapes):
    outs = []
    p = 0
    for s in shapes:
        n = int(np.prod(s))
        outs.append(vec[p:p + n].reshape(s))
        p += n
    return tuple(outs[:2]), tuple(outs[2:])


def kernel(eris: UERIs, max_cycle=50, conv_tol=1e-8, conv_tol_normt=1e-6,
           diis_space=6, verbose=0, t1=None, t2=None, level_shift=0.0,
           ntile=4, diis_backend="host"):
    """DIIS-accelerated UCCSD iteration.  Returns (converged, e, t1, t2).

    diis_backend='device' keeps the DIIS ring in HBM (host-solve hybrid,
    lib/device_diis.update_hostsolve): only the (nd+1)^2 B system and
    convergence scalars cross the host link each cycle — the open-shell
    production runs otherwise round-trip all five amplitude blocks
    through the dev tunnel every cycle (same tradeoff as rccsd.kernel)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    from pyscf_mpcc_tpu.lib.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    log = lg.Logger(verbose=verbose)
    emp2, t1_0, t2_0 = init_amps(eris)
    if t1 is None:
        t1 = t1_0
    if t2 is None:
        t2 = t2_0
    shapes = [x.shape for x in (*t1, *t2)]
    log.info("UCCSD MP2 init E_corr = %.14f", float(emp2))
    if diis_backend == "device":
        from pyscf_mpcc_tpu.lib import device_diis
        n_all = sum(int(np.prod(s)) for s in shapes)
        dstate = device_diis.init(n_all, diis_space, t2[1].dtype)
        pack = jax.jit(lambda *xs: jnp.concatenate([x.ravel() for x in xs]))
        vec_old = pack(*t1, *t2)
    else:
        diis = DIIS(space=diis_space)
    e_last = float(energy(t1, t2, eris))
    converged = False
    e = e_last
    for it in range(max_cycle):
        t1new, t2new = update_amps(t1, t2, eris, level_shift, ntile=ntile)
        normt = sum(float(jnp.linalg.norm(a - b))
                    for a, b in zip((*t1new, *t2new), (*t1, *t2)))
        if diis_backend == "device":
            vec_new = pack(*t1new, *t2new)
            del t1new, t2new
            dstate, vec = device_diis.update_hostsolve(dstate, vec_new,
                                                       vec_new - vec_old)
            del vec_new
            vec_old = vec
            t1, t2 = vector_to_amplitudes(vec, shapes)
        else:
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
    """Map blocked amplitudes to spin-orbital arrays in the gccsd_slow
    ordering [occ_a, occ_b, vir_a, vir_b]."""
    t1a, t1b = t1
    t2aa, t2ab, t2bb = t2
    na, nb = nocc
    va = t1a.shape[1]
    vb = t1b.shape[1]
    no = na + nb
    nv = va + vb
    T1 = np.zeros((no, nv))
    T1[:na, :va] = np.asarray(t1a)
    T1[na:, va:] = np.asarray(t1b)
    T2 = np.zeros((no, no, nv, nv))
    T2[:na, :na, :va, :va] = np.asarray(t2aa)
    T2[na:, na:, va:, va:] = np.asarray(t2bb)
    t2ab_ = np.asarray(t2ab)
    T2[:na, na:, :va, va:] = t2ab_
    T2[na:, :na, va:, :va] = t2ab_.transpose(1, 0, 3, 2)
    T2[:na, na:, va:, :va] = -t2ab_.transpose(0, 1, 3, 2)
    T2[na:, :na, :va, va:] = -t2ab_.transpose(1, 0, 2, 3)
    return T1, T2
