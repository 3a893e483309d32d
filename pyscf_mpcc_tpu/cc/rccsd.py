"""Restricted (closed-shell) CCSD — the TPU production path.

Spin-adapted CCSD equations of Hirata et al., J. Chem. Phys. 120, 2581
(2004), Eqs. (35)-(45) — the same formulation as the reference's
pyscf/cc/rccsd.py:44 + rintermediates.py, re-designed as one fused, jitted,
pure-functional residual: amplitudes are a pytree, every contraction is a
dense einsum XLA maps onto the MXU, and the O(nocc^2 nvir^4) particle-
particle ladder runs either from materialized vvvv (small systems) or from
density-fitted Lvv factors tiled with lax.map (production; the reference's
blocked-HDF5 _add_vvvv becomes a static tiling over the virtual axis).

Non-canonical (e.g. localized-orbital) Fock matrices are handled the
reference way: the Fock diagonal lives in the denominators, off-diagonal
blocks stay in the residual intermediates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc.eris import RERIs


def init_amps(eris: RERIs):
    """MP2 initial guess; returns (emp2, t1, t2)."""
    nocc = eris.nocc
    fock = eris.fock
    fov = fock[:nocc, nocc:]
    eo = eris.mo_energy[:nocc]
    ev = eris.mo_energy[nocc:]
    eia = eo[:, None] - ev[None, :]
    d2 = eia[:, None, :, None] + eia[None, :, None, :]
    t1 = fov / eia
    ovov = eris.ovov
    t2 = ovov.transpose(0, 2, 1, 3) / d2
    emp2 = 2.0 * jnp.einsum("ijab,iajb->", t2, ovov)
    emp2 -= jnp.einsum("ijab,ibja->", t2, ovov)
    return emp2, t1, t2


def energy(t1, t2, eris: RERIs):
    nocc = eris.nocc
    fov = eris.fock[:nocc, nocc:]
    tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1)
    e = 2.0 * jnp.einsum("ia,ia->", fov, t1)
    e += 2.0 * jnp.einsum("ijab,iajb->", tau, eris.ovov)
    e -= jnp.einsum("ijab,ibja->", tau, eris.ovov)
    return e


def _ladder_vvvv(tau, t1, eris):
    """tau * Wvvvv from materialized (ab|cd) (Hirata chi_vvvv)."""
    w = eris.vvvv.transpose(0, 2, 1, 3)  # (ac|bd) -> W[a,b,c,d]
    w = w - jnp.einsum("kdac,kb->abcd", eris.ovvv, t1)
    w = w - jnp.einsum("kcbd,ka->abcd", eris.ovvv, t1)
    return jnp.einsum("abcd,ijcd->ijab", w, tau)


def _ladder_df(tau, t1, eris, ntile):
    """tau * Wvvvv from DF factors with t1-dressed Lvv, tiled over
    symmetric virtual tile PAIRS.

    Ldressed[L,a,c] = Lvv[L,a,c] - sum_k t1[k,a] Lov[L,k,c]; the spurious
    quadratic term sum_kl t1_ka t1_lb (kc|ld) tau_ijcd is subtracted
    explicitly.  Equivalent of the reference's dfccsd._contract_vvvv_t2
    (pyscf/cc/dfccsd.py:54); the tile-pair mirror below is the TPU-dense
    counterpart of that routine's s4-packed dgemm.

    Symmetry: W[a,c,b,d] = sum_L Ld[L,ac] Ld[L,bd] swaps its two factor
    slots exactly, W[acbd] = W[bdac], even with t1-dressing (it is the
    X^T X structure, not the eri's own permutation symmetry), and tau is
    (ij)<->(cd) joint-swap symmetric, so the ladder output obeys
    Ht2[i,j,a,b] = Ht2[j,i,b,a].  Tiling BOTH output virtual axes into
    `ntile` tiles and evaluating only pairs A >= B halves the two
    dominant dot costs (the naux*nvir^4 W build and the nocc^2*nvir^4
    contraction); A < B blocks are transposed mirrors.  tau is
    symmetrized on entry so the mirrored ladder is a well-defined (and
    AD-consistent: its vjp is the symmetric projection of the dense
    ladder's) function of an arbitrary t2 — an exact FP no-op for the
    symmetric iterates every solver here produces.

    nvir is zero-padded to a tile multiple internally; any ntile >= 1
    is legal.
    """
    if eris.Lvv_stream is not None:
        # single-chip out-of-core: Lvv lives in host RAM and the mirrored
        # pair sweep pulls dressed tiles through io_callback
        # (cc/stream_ladder, hand-derived custom_vjp)
        from pyscf_mpcc_tpu.cc import stream_ladder
        nocc, nvir = t1.shape
        ladder = stream_ladder.make_streamed_ladder(
            nocc, nvir, eris.Lov.shape[0], ntile, eris.Lov.dtype)
        out = ladder(tau, t1, eris.Lov, eris.Lvv_stream)
    else:
        Lvv, Lov = eris.Lvv, eris.Lov
        Ld = Lvv - jnp.einsum("ka,Lkc->Lac", t1, Lov)
        out = pair_ladder_sym(tau, Ld, ntile)
    # subtract the quadratic dressing artifact
    tmp = jnp.einsum("kcld,ijcd->klij", eris.ovov, tau)
    out = out - jnp.einsum("klij,ka,lb->ijab", tmp, t1, t1)
    return out


def pair_ladder_sym(tau, Ld, ntile):
    """out[ijab] = sum_{L,c,d} Ld[L,a,c] Ld[L,b,d] tau[i,j,c,d], evaluated
    only on virtual tile pairs A >= B; A < B blocks are transposed mirrors
    (see _ladder_df's symmetry note).  Requires (exactly: enforces) tau
    symmetric under the joint (ij)<->(cd) swap.  Also the aa/bb ladder of
    the spin-traced UCCSD engine (cc/uccsd._ladder_tiled dispatches here
    when both factors are the same array)."""
    # exact pass-through for symmetric tau (x+x is exact, 0.5* is exact)
    tau = 0.5 * (tau + tau.transpose(1, 0, 3, 2))
    naux, nvir = Ld.shape[0], Ld.shape[1]
    nocc = tau.shape[0]
    ntile = max(1, min(int(ntile), nvir))
    tsz = -(-nvir // ntile)
    nvp = ntile * tsz
    pad = nvp - nvir
    if pad:
        # padded a-rows of Ld are zero -> zero output rows (mirrors stay
        # exact); padded c-columns contract against zero tau columns
        Ld = jnp.pad(Ld, ((0, 0), (0, pad), (0, pad)))
        tau_p = jnp.pad(tau, ((0, 0), (0, 0), (0, pad), (0, pad)))
    else:
        tau_p = tau
    Ld_t = Ld.reshape(naux, ntile, tsz, nvp).transpose(1, 0, 2, 3)
    pairs = np.asarray([(a, b)
                        for a in range(ntile) for b in range(a + 1)],
                       dtype=np.int32)

    def pair_fn(ab):
        lda = Ld_t[ab[0]]
        ldb = Ld_t[ab[1]]
        # 'acbd' is the natural dot_general output layout ((a,c) from one
        # tile, (b,d) from the other) — consuming it directly saves an
        # explicit HBM transpose per pair (~15% on the ladder, measured
        # at (H2O)8/cc-pVTZ shape on v5e).
        w = jnp.einsum("Lac,Lbd->acbd", lda, ldb)
        return jnp.einsum("acbd,ijcd->ijab", w, tau_p)

    # checkpoint: under vjp (Lambda/RDM solvers) the scan would otherwise
    # save every pair's 4-index w block for the backward pass — an
    # O(nvir^4) spill (129 GB at (H2O)8/cc-pVTZ).  Rematerializing w per
    # pair costs one extra dressed dot in the backward sweep and nothing
    # in the forward-only solve.
    block_fn = jax.checkpoint(pair_fn)

    # Assembly writes each A>=B block straight into the FINAL 4D layout
    # with dynamic_update_slice inside the scan; the A<B mirrors
    # (Ht2[ij,Btile,Atile] = Ht2[ji,Atile,Btile]^T) are applied ONCE
    # after the scan as S + S.transpose(1,0,3,2), with diagonal blocks
    # pre-halved (they are their own mirror for symmetric tau).  Earlier
    # assemblies that moved transposed data inside the scan — the
    # stack/scatter/6-axis-transpose version AND the per-iteration
    # mirrored dus write — made XLA materialize transposed copies of the
    # output-sized carry whose minor-most dim is nocc, which Mosaic
    # tiling pads nocc->128 (4x at (H2O)8 shape: two 3.06 GB HLO temps,
    # 763 MB over HBM in the Lambda jvp).  The single post-scan
    # symmetrization is one fusible tiled transpose; the dus chain is
    # linear in the carry, so the scan vjp saves no per-iteration
    # carries: the backward sweep holds ONE output-sized cotangent and
    # slices block cotangents out of it.
    def body(out, ab):
        blk = block_fn(ab)
        # halve diagonal blocks: the post-scan S + S^T counts them twice
        blk = jnp.where(ab[0] == ab[1], 0.5, 1.0).astype(blk.dtype) * blk
        out = jax.lax.dynamic_update_slice(
            out, blk, (jnp.int32(0), jnp.int32(0), ab[0] * tsz,
                       ab[1] * tsz))
        return out, None

    out0 = jnp.zeros((nocc, nocc, nvp, nvp), tau.dtype)
    s, _ = jax.lax.scan(body, out0, jnp.asarray(pairs))
    out = s + s.transpose(1, 0, 3, 2)
    if pad:
        out = out[:, :, :nvir, :nvir]
    return out


class _OvvvOps:
    """The ovvv-block contractions, in materialized or DF-factorized form.

    At production scale the (ia|bc) block is O(nocc nvir^3) and cannot be
    materialized (12 GB for (H2O)8/cc-pVTZ in fp32); every use factorizes
    exactly through the 3-center L tensors (role of the reference's
    blocked _add_ovvv_ loops, pyscf/cc/ccsd.py:337, without the I/O)."""

    def __init__(self, eris: RERIs, ntile=1):
        self.eris = eris
        self.df = eris.ovvv is None
        if eris.Lvv_stream is not None:
            # streamed mode: every contraction routes to the StreamedOvvv
            # twin (same math, Lvv tiles fetched from host); instance
            # attributes shadow the class methods below
            from pyscf_mpcc_tpu.cc import stream_ladder
            stream = stream_ladder.StreamedOvvv(
                eris.Lvv_stream, eris.Lov, eris.nvir, ntile,
                eris.Lov.dtype)
            for m in ("t1_t2_terms", "lvv_t1", "wvoov_t1", "wvovo_t1",
                      "t2_vvov_t1"):
                setattr(self, m, getattr(stream, m))

    def t1_t2_terms(self, t2):
        """2*(kd|ac) t2[ikcd] - (kc|ad) t2[ikcd] -> [ia]"""
        e = self.eris
        if not self.df:
            return (2.0 * jnp.einsum("kdac,ikcd->ia", e.ovvv, t2)
                    - jnp.einsum("kcad,ikcd->ia", e.ovvv, t2))
        x = jnp.einsum("Lkd,ikcd->Lic", e.Lov, t2)
        out = 2.0 * jnp.einsum("Lic,Lac->ia", x, e.Lvv)
        y = jnp.einsum("Lkc,ikcd->Lid", e.Lov, t2)
        out -= jnp.einsum("Lid,Lad->ia", y, e.Lvv)
        return out

    def lvv_t1(self, t1):
        """2*(kd|ac) t1[kd] - (kc|ad) t1[kd] -> [ac]"""
        e = self.eris
        if not self.df:
            return (2.0 * jnp.einsum("kdac,kd->ac", e.ovvv, t1)
                    - jnp.einsum("kcad,kd->ac", e.ovvv, t1))
        z = jnp.einsum("Lkd,kd->L", e.Lov, t1)
        out = 2.0 * jnp.einsum("L,Lac->ac", z, e.Lvv)
        x = jnp.einsum("Lkc,kd->Lcd", e.Lov, t1)
        out -= jnp.einsum("Lcd,Lad->ac", x, e.Lvv)
        return out

    def wvoov_t1(self, t1):
        """(kc|ad) t1[id] -> [akic]"""
        e = self.eris
        if not self.df:
            return jnp.einsum("kcad,id->akic", e.ovvv, t1)
        x = jnp.einsum("Lad,id->Lai", e.Lvv, t1)
        return jnp.einsum("Lai,Lkc->akic", x, e.Lov)

    def wvovo_t1(self, t1):
        """(kd|ac) t1[id] -> [akci]"""
        e = self.eris
        if not self.df:
            return jnp.einsum("kdac,id->akci", e.ovvv, t1)
        x = jnp.einsum("Lkd,id->Lki", e.Lov, t1)
        return jnp.einsum("Lki,Lac->akci", x, e.Lvv)

    def t2_vvov_t1(self, t1):
        """sum_c (ia|cb) t1[jc] -> [ijab] (the vv-ov piece of chi_vvov)"""
        e = self.eris
        if not self.df:
            tmp2 = e.ovvv.conj().transpose(1, 3, 0, 2)
            return jnp.einsum("abic,jc->ijab", tmp2, t1)
        x = jnp.einsum("Lcb,jc->Ljb", e.Lvv, t1)
        return jnp.einsum("Lia,Ljb->ijab", e.Lov, x)


@partial(jax.jit, static_argnames=("ntile", "variant"))
def update_amps(t1, t2, eris: RERIs, level_shift=0.0, ntile=1,
                variant="ccsd"):
    """One Jacobi sweep of the RCCSD / CC2 / CCD equations.

    variant: 'ccsd' (default), 'cc2' (T2 truncated to first order in the
    fluctuation potential with t1-dressing, reference rccsd.py cc2 branch),
    'ccd' (t1 pinned at zero, reference cc/ccd.py)."""
    nocc = eris.nocc
    fock = eris.fock
    fov = fock[:nocc, nocc:]
    foo = fock[:nocc, :nocc]
    fvv = fock[nocc:, nocc:]
    mo_e_o = eris.mo_energy[:nocc]
    mo_e_v = eris.mo_energy[nocc:] + level_shift

    ovov = eris.ovov
    ovoo = eris.ovoo
    ovvo = eris.get_ovvo()
    oovv = eris.oovv
    oooo = eris.oooo
    vops = _OvvvOps(eris, ntile)

    # --- kappa intermediates (Eqs. 37-39), Fock diagonal removed ---------
    Foo = foo + 2.0 * jnp.einsum("kcld,ilcd->ki", ovov, t2) \
        - jnp.einsum("kdlc,ilcd->ki", ovov, t2) \
        + 2.0 * jnp.einsum("kcld,ic,ld->ki", ovov, t1, t1) \
        - jnp.einsum("kdlc,ic,ld->ki", ovov, t1, t1)
    Fvv = fvv - 2.0 * jnp.einsum("kcld,klad->ac", ovov, t2) \
        + jnp.einsum("kdlc,klad->ac", ovov, t2) \
        - 2.0 * jnp.einsum("kcld,ka,ld->ac", ovov, t1, t1) \
        + jnp.einsum("kdlc,ka,ld->ac", ovov, t1, t1)
    Fov = fov + 2.0 * jnp.einsum("kcld,ld->kc", ovov, t1) \
        - jnp.einsum("kdlc,ld->kc", ovov, t1)

    Foo_nd = Foo - jnp.diag(mo_e_o)
    Fvv_nd = Fvv - jnp.diag(mo_e_v)

    # --- T1 (Eq. 35) ------------------------------------------------------
    t1new = fov.conj()
    t1new -= 2.0 * jnp.einsum("kc,ka,ic->ia", fov, t1, t1)
    t1new += jnp.einsum("ac,ic->ia", Fvv_nd, t1)
    t1new -= jnp.einsum("ki,ka->ia", Foo_nd, t1)
    t1new += 2.0 * jnp.einsum("kc,kica->ia", Fov, t2)
    t1new -= jnp.einsum("kc,ikca->ia", Fov, t2)
    t1new += jnp.einsum("kc,ic,ka->ia", Fov, t1, t1)
    t1new += 2.0 * jnp.einsum("kcai,kc->ia", ovvo, t1)
    t1new -= jnp.einsum("kiac,kc->ia", oovv, t1)
    t1new += vops.t1_t2_terms(t2)
    lvv_t1 = vops.lvv_t1(t1)
    t1new += jnp.einsum("ac,ic->ia", lvv_t1, t1)
    t1new -= 2.0 * jnp.einsum("lcki,klac->ia", ovoo, t2)
    t1new += jnp.einsum("kcli,klac->ia", ovoo, t2)
    t1new -= 2.0 * jnp.einsum("lcki,lc,ka->ia", ovoo, t1, t1)
    t1new += jnp.einsum("kcli,lc,ka->ia", ovoo, t1, t1)

    # --- lambda intermediates (Eqs. 40-41) --------------------------------
    if variant == "cc2":
        # CC2: doubles see only the Fock operator (t1-dressed)
        Loo = foo - jnp.diag(mo_e_o) + jnp.einsum("kc,ic->ki", fov, t1)
        Lvv = fvv - jnp.diag(mo_e_v) - jnp.einsum("kc,ka->ac", fov, t1)
    else:
        Loo = Foo_nd + jnp.einsum("kc,ic->ki", fov, t1) \
            + 2.0 * jnp.einsum("lcki,lc->ki", ovoo, t1) \
            - jnp.einsum("kcli,lc->ki", ovoo, t1)
        Lvv = Fvv_nd - jnp.einsum("kc,ka->ac", fov, t1) + lvv_t1

    # --- chi intermediates (Eqs. 42-45) -----------------------------------
    # checkpointed: under vjp (Lambda/RDM solvers) the three W tensors and
    # tau would otherwise all be saved for the backward pass (~3 GB at
    # (H2O)8/cc-pVTZ, the difference between fitting HBM and not);
    # rematerializing them costs a few percent of the backward sweep and
    # nothing in the forward-only CCSD solve.
    @jax.checkpoint
    def _chi(t1, t2):
        Woooo = oooo.transpose(0, 2, 1, 3) \
            + jnp.einsum("lcki,jc->klij", ovoo, t1) \
            + jnp.einsum("kclj,ic->klij", ovoo, t1) \
            + jnp.einsum("kcld,ic,jd->klij", ovov, t1, t1)
        if variant != "cc2":
            Woooo = Woooo + jnp.einsum("kcld,ijcd->klij", ovov, t2)

        Wvoov = ovvo.transpose(2, 0, 3, 1) \
            + vops.wvoov_t1(t1) \
            - jnp.einsum("kcli,la->akic", ovoo, t1) \
            - 0.5 * jnp.einsum("ldkc,ilda->akic", ovov, t2) \
            - 0.5 * jnp.einsum("lckd,ilad->akic", ovov, t2) \
            - jnp.einsum("ldkc,id,la->akic", ovov, t1, t1) \
            + jnp.einsum("ldkc,ilad->akic", ovov, t2)

        Wvovo = oovv.transpose(2, 0, 3, 1) \
            + vops.wvovo_t1(t1) \
            - jnp.einsum("lcki,la->akci", ovoo, t1) \
            - 0.5 * jnp.einsum("lckd,ilda->akci", ovov, t2) \
            - jnp.einsum("lckd,id,la->akci", ovov, t1, t1)

        if variant == "cc2":
            tau = jnp.einsum("ia,jb->ijab", t1, t1)
        else:
            tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1)
        return Woooo, Wvoov, Wvovo, tau

    # --- T2 (Eq. 36) ------------------------------------------------------
    Woooo, Wvoov, Wvovo, tau = _chi(t1, t2)

    # All P(ij|ab)-symmetrized pieces accumulate into ONE asymmetric buffer
    # K, symmetrized once at the end — this keeps the number of live
    # t2-sized temporaries small enough for HBM at production scale.
    # the barrier pins the accumulation order so only one t2-sized dot
    # output is live at a time (required to fit HBM at production scale)
    bar = jax.lax.optimization_barrier
    tmp2 = ovoo.transpose(1, 3, 0, 2).conj() \
        + jnp.einsum("kcai,jc->akij", ovvo, t1)
    K = vops.t2_vvov_t1(t1)
    K = bar(K - jnp.einsum("kibc,ka,jc->ijab", oovv, t1, t1))
    K = bar(K - jnp.einsum("akij,kb->ijab", tmp2, t1))
    K = bar(K + jnp.einsum("ac,ijcb->ijab", Lvv, t2))
    K = bar(K - jnp.einsum("ki,kjab->ijab", Loo, t2))
    if variant != "cc2":
        K = bar(K + 2.0 * jnp.einsum("akic,kjcb->ijab", Wvoov, t2))
        K = bar(K - jnp.einsum("akci,kjcb->ijab", Wvovo, t2))
        K = bar(K - jnp.einsum("akic,kjbc->ijab", Wvoov, t2))
        K = bar(K - jnp.einsum("bkci,kjac->ijab", Wvovo, t2))

    t2new = K + K.transpose(1, 0, 3, 2)
    t2new += ovov.conj().transpose(0, 2, 1, 3)
    t2new = bar(t2new + jnp.einsum("klij,klab->ijab", Woooo, tau))
    if eris.vvvv is not None:
        t2new += _ladder_vvvv(tau, t1, eris)
    else:
        t2new += _ladder_df(tau, t1, eris, ntile)

    eia = mo_e_o[:, None] - mo_e_v[None, :]
    d2 = eia[:, None, :, None] + eia[None, :, None, :]
    t1new = t1new / eia
    t2new = t2new / d2
    if variant == "ccd":
        t1new = jnp.zeros_like(t1new)
    return t1new, t2new


def residual_segments(eris: RERIs, ntile=1, variant="ccsd",
                      split_rings=True, ladder=True):
    """The amplitude residual R(t) = update_raw(t) - t*D, decomposed into
    independent pieces for the SEGMENTED Lambda vjp.

    Returns a list of (fn, kind) where fn(t1, t2) computes one additive
    piece and kind tells the caller which cotangent it takes:
      'r1'  — contributes to R1 directly          (cotangent l1)
      'k'   — contributes to R2 as  K + K^(jiba)  (cotangent l2 + l2^(jiba))
      'r2'  — contributes to R2 directly          (cotangent l2)
    The diagonal  -t*D  piece is analytic and NOT included (the caller adds
    -l*D to the accumulators directly).

    Why: jax.vjp over the whole fused update keeps every ring-intermediate
    cotangent (dWvoov, dWvovo, dtau, dK, ...) live simultaneously — a
    17.5 GB backward at (H2O)8/cc-pVTZ vs 15.75 GB of HBM.  vjp-ing each
    piece separately (the caller serializes them with optimization
    barriers) makes peak memory the max over segments instead of the sum.
    Exactness is pinned by tests: sum(segments) - t*D == residual() and
    segmented jtvp == monolithic jtvp.

    Reference counterpart: the hand-blocked make_intermediates /
    update_lambda of pyscf/cc/ccsd_lambda.py:35, whose intermediates are
    likewise never all materialized at once.
    """
    nocc = eris.nocc
    fock = eris.fock
    fov = fock[:nocc, nocc:]
    foo = fock[:nocc, :nocc]
    fvv = fock[nocc:, nocc:]
    mo_e_o = eris.mo_energy[:nocc]
    mo_e_v = eris.mo_energy[nocc:]
    ovov, ovoo, oovv, oooo = eris.ovov, eris.ovoo, eris.oovv, eris.oooo
    ovvo = eris.get_ovvo()
    vops = _OvvvOps(eris, ntile)

    def _kappa(t1, t2):
        Foo = foo + 2.0 * jnp.einsum("kcld,ilcd->ki", ovov, t2) \
            - jnp.einsum("kdlc,ilcd->ki", ovov, t2) \
            + 2.0 * jnp.einsum("kcld,ic,ld->ki", ovov, t1, t1) \
            - jnp.einsum("kdlc,ic,ld->ki", ovov, t1, t1)
        Fvv = fvv - 2.0 * jnp.einsum("kcld,klad->ac", ovov, t2) \
            + jnp.einsum("kdlc,klad->ac", ovov, t2) \
            - 2.0 * jnp.einsum("kcld,ka,ld->ac", ovov, t1, t1) \
            + jnp.einsum("kdlc,ka,ld->ac", ovov, t1, t1)
        Fov = fov + 2.0 * jnp.einsum("kcld,ld->kc", ovov, t1) \
            - jnp.einsum("kdlc,ld->kc", ovov, t1)
        return (Foo - jnp.diag(mo_e_o), Fvv - jnp.diag(mo_e_v), Fov)

    def _loo_lvv(t1, t2, Foo_nd, Fvv_nd, lvv_t1):
        if variant == "cc2":
            Loo = foo - jnp.diag(mo_e_o) + jnp.einsum("kc,ic->ki", fov, t1)
            Lvv = fvv - jnp.diag(mo_e_v) - jnp.einsum("kc,ka->ac", fov, t1)
        else:
            Loo = Foo_nd + jnp.einsum("kc,ic->ki", fov, t1) \
                + 2.0 * jnp.einsum("lcki,lc->ki", ovoo, t1) \
                - jnp.einsum("kcli,lc->ki", ovoo, t1)
            Lvv = Fvv_nd - jnp.einsum("kc,ka->ac", fov, t1) + lvv_t1
        return Loo, Lvv

    # The R1 residual is decomposed into FOUR sub-segments: its backward
    # accumulates one t2-sized cotangent partial per ovov.t2 / ovoo.t2
    # chain, and XLA schedules independent partials concurrently — the
    # monolithic seg_t1 vjp measured 6.6 GiB of temps at (H2O)8 shape
    # (tools/lambda_seg_probe.py), the single peak of the whole Lambda
    # step.  Split along the intermediate families, each piece holds at
    # most two t2-sized partials.
    def seg_t1_fvv(t1, t2):
        _, Fvv_nd, _ = _kappa(t1, t2)
        r = fov.conj().astype(t1.dtype) + jnp.zeros_like(t1)
        r -= 2.0 * jnp.einsum("kc,ka,ic->ia", fov, t1, t1)
        r += jnp.einsum("ac,ic->ia", Fvv_nd, t1)
        return r

    def seg_t1_foo(t1, t2):
        Foo_nd, _, _ = _kappa(t1, t2)
        return -jnp.einsum("ki,ka->ia", Foo_nd, t1)

    def seg_t1_fov(t1, t2):
        _, _, Fov = _kappa(t1, t2)
        r = 2.0 * jnp.einsum("kc,kica->ia", Fov, t2)
        r -= jnp.einsum("kc,ikca->ia", Fov, t2)
        r += jnp.einsum("kc,ic,ka->ia", Fov, t1, t1)
        return r

    def seg_t1_rest(t1, t2):
        r = 2.0 * jnp.einsum("kcai,kc->ia", ovvo, t1)
        r -= jnp.einsum("kiac,kc->ia", oovv, t1)
        r += vops.t1_t2_terms(t2)
        r += jnp.einsum("ac,ic->ia", vops.lvv_t1(t1), t1)
        r -= 2.0 * jnp.einsum("lcki,klac->ia", ovoo, t2)
        r += jnp.einsum("kcli,klac->ia", ovoo, t2)
        r -= 2.0 * jnp.einsum("lcki,lc,ka->ia", ovoo, t1, t1)
        r += jnp.einsum("kcli,lc,ka->ia", ovoo, t1, t1)
        return r

    def seg_t1(t1, t2):
        return (seg_t1_fvv(t1, t2) + seg_t1_foo(t1, t2)
                + seg_t1_fov(t1, t2) + seg_t1_rest(t1, t2))

    def seg_k_light(t1, t2):
        Foo_nd, Fvv_nd, _ = _kappa(t1, t2)
        Loo, Lvv = _loo_lvv(t1, t2, Foo_nd, Fvv_nd, vops.lvv_t1(t1))
        tmp2 = ovoo.transpose(1, 3, 0, 2).conj() \
            + jnp.einsum("kcai,jc->akij", ovvo, t1)
        K = vops.t2_vvov_t1(t1)
        K -= jnp.einsum("kibc,ka,jc->ijab", oovv, t1, t1)
        K -= jnp.einsum("akij,kb->ijab", tmp2, t1)
        K += jnp.einsum("ac,ijcb->ijab", Lvv, t2)
        K -= jnp.einsum("ki,kjab->ijab", Loo, t2)
        return K

    @jax.checkpoint
    def _wvoov(t1, t2):
        return ovvo.transpose(2, 0, 3, 1) \
            + vops.wvoov_t1(t1) \
            - jnp.einsum("kcli,la->akic", ovoo, t1) \
            - 0.5 * jnp.einsum("ldkc,ilda->akic", ovov, t2) \
            - 0.5 * jnp.einsum("lckd,ilad->akic", ovov, t2) \
            - jnp.einsum("ldkc,id,la->akic", ovov, t1, t1) \
            + jnp.einsum("ldkc,ilad->akic", ovov, t2)

    @jax.checkpoint
    def _wvovo(t1, t2):
        return oovv.transpose(2, 0, 3, 1) \
            + vops.wvovo_t1(t1) \
            - jnp.einsum("lcki,la->akci", ovoo, t1) \
            - 0.5 * jnp.einsum("lckd,ilda->akci", ovov, t2) \
            - jnp.einsum("lckd,id,la->akci", ovov, t1, t1)

    def seg_ring_voov(t1, t2):
        W = _wvoov(t1, t2)
        bar = jax.lax.optimization_barrier
        K = 2.0 * jnp.einsum("akic,kjcb->ijab", W, t2)
        K = bar(K - jnp.einsum("akic,kjbc->ijab", W, t2))
        return K

    def seg_ring_vovo(t1, t2):
        W = _wvovo(t1, t2)
        bar = jax.lax.optimization_barrier
        K = -jnp.einsum("akci,kjcb->ijab", W, t2)
        K = bar(K - jnp.einsum("bkci,kjac->ijab", W, t2))
        return K

    def seg_rings(t1, t2):
        return seg_ring_voov(t1, t2) + seg_ring_vovo(t1, t2)

    def seg_oooo(t1, t2):
        Woooo = oooo.transpose(0, 2, 1, 3) \
            + jnp.einsum("lcki,jc->klij", ovoo, t1) \
            + jnp.einsum("kclj,ic->klij", ovoo, t1) \
            + jnp.einsum("kcld,ic,jd->klij", ovov, t1, t1)
        if variant != "cc2":
            Woooo = Woooo + jnp.einsum("kcld,ijcd->klij", ovov, t2)
        if variant == "cc2":
            tau = jnp.einsum("ia,jb->ijab", t1, t1)
        else:
            tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1)
        return jnp.einsum("klij,klab->ijab", Woooo, tau)

    def seg_ladder(t1, t2):
        if variant == "cc2":
            tau = jnp.einsum("ia,jb->ijab", t1, t1)
        else:
            tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1)
        if eris.vvvv is not None:
            return _ladder_vvvv(tau, t1, eris)
        return _ladder_df(tau, t1, eris, ntile)

    segs = [(seg_t1_fvv, "r1"), (seg_t1_foo, "r1"), (seg_t1_fov, "r1"),
            (seg_t1_rest, "r1"), (seg_k_light, "k")]
    if variant == "ccd":
        segs = [(seg_k_light, "k")]
    if variant != "cc2":
        if split_rings:
            segs += [(seg_ring_voov, "k"), (seg_ring_vovo, "k")]
        else:
            segs += [(seg_rings, "k")]
    segs += [(seg_oooo, "r2")]
    if ladder:
        # ladder=False callers (the Ozaki-offloaded fp64 certification,
        # lambda_ad.lagrangian_energy ladder_backend='ozaki') evaluate
        # <l2, seg_ladder> on the int8 MXU instead (ops/ozaki.py)
        segs += [(seg_ladder, "r2")]
    return segs


def residual_from_segments(t1, t2, eris: RERIs, ntile=1, variant="ccsd",
                           ladder=True):
    """R(t) assembled from the segments + the constant and diagonal pieces
    (test/validation path; the Lambda solver only ever needs the jtvp)."""
    nocc = eris.nocc
    eia = eris.mo_energy[:nocc, None] - eris.mo_energy[None, nocc:]
    d2 = eia[:, None, :, None] + eia[None, :, None, :]
    r1 = -t1 * eia
    r2 = eris.ovov.conj().transpose(0, 2, 1, 3) - t2 * d2
    for fn, kind in residual_segments(eris, ntile, variant, ladder=ladder):
        c = fn(t1, t2)
        if kind == "r1":
            r1 = r1 + c
        elif kind == "k":
            r2 = r2 + c + c.transpose(1, 0, 3, 2)
        else:
            r2 = r2 + c
    if variant == "ccd":
        r1 = jnp.zeros_like(r1)
    return r1, r2


def kernel(eris: RERIs, max_cycle=50, conv_tol=1e-8, conv_tol_normt=1e-6,
           diis_space=6, level_shift=0.0, verbose=0, t1=None, t2=None,
           ntile=1, diis_start_cycle=0, variant="ccsd",
           diis_backend="host", adiis=None, diis_file=None,
           diis_err_dtype=None):
    """Host-driven CCSD iteration with DIIS (reference cc/ccsd.py:44).

    adiis: preloaded host DIIS object (lib.diis.DIIS.restore) to resume a
    run with its extrapolation history (reference cc/ccsd.py:781
    restore_from_diis_); diis_file: spill the ring buffer there every
    cycle so the run is preemption-safe.  diis_err_dtype=jnp.bfloat16
    halves the device error-ring HBM footprint (device backend only; the
    hostsolve hybrid solves B in fp64 either way).  Returns (converged,
    e_corr, t1, t2).
    """
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
    log.info("RCCSD MP2 init E_corr = %.14f", float(emp2))
    nocc, nvir = t1.shape
    e_last = float(energy(t1, t2, eris))
    converged = False
    if diis_backend == "device":
        # amplitude-sized data never leaves the device: the ring buffer,
        # the B-matrix solve, and the extrapolation are all jitted
        from pyscf_mpcc_tpu.lib import device_diis
        n_all = nocc * nvir + int(np.prod(t2.shape))
        dstate = device_diis.init(n_all, diis_space, t2.dtype,
                                  err_dtype=diis_err_dtype)
        pack = jax.jit(lambda a, b: jnp.concatenate([a.ravel(), b.ravel()]))
        vec_old = pack(t1, t2)
    else:
        diis = adiis if adiis is not None else DIIS(space=diis_space)
        if adiis is not None and adiis._xs:
            # resume from the last extrapolated amplitudes in the ring
            vec = adiis._xs[-1]
            t1 = jnp.asarray(vec[: nocc * nvir].reshape(nocc, nvir))
            t2 = jnp.asarray(vec[nocc * nvir:].reshape(t2.shape))
    for it in range(max_cycle):
        t1new, t2new = update_amps(t1, t2, eris, level_shift, ntile=ntile,
                                   variant=variant)
        normt = float(jnp.linalg.norm(t1new - t1)
                      + jnp.linalg.norm(t2new - t2))
        if it < diis_start_cycle:
            t1, t2 = t1new, t2new
        elif diis_backend == "device":
            vec_new = pack(t1new, t2new)
            t2shape = t2new.shape
            del t1new, t2new       # 1.5 GB at production scale: release
            # host-solve hybrid: ring + Gram in HBM, fp64 B solve on the
            # host (fp32 on-device eigh stalls the solve at |dt| ~ 1e-5)
            dstate, vec = device_diis.update_hostsolve(dstate, vec_new,
                                                       vec_new - vec_old)
            del vec_new
            vec_old = vec
            t1 = vec[: nocc * nvir].reshape(nocc, nvir)
            t2 = vec[nocc * nvir:].reshape(t2shape)
        else:
            vec = np.concatenate([np.asarray(t1new).ravel(),
                                  np.asarray(t2new).ravel()])
            vec = diis.update(vec)
            t1 = jnp.asarray(vec[: nocc * nvir].reshape(nocc, nvir))
            t2 = jnp.asarray(vec[nocc * nvir:].reshape(t2new.shape))
            if diis_file is not None:
                diis.dump(diis_file)
        e = float(energy(t1, t2, eris))
        log.info("cycle %2d  E_corr(RCCSD) = %.14f  dE = %10.3e  |dt| = %9.3e",
                 it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return converged, e, t1, t2


def flops_per_update(nocc, nvir, naux=None, ntile=None):
    """Analytic FLOP count of one update (reference _flops analog,
    pyscf/cc/ccsd.py:1754) — the denominator for MXU-utilization
    reporting.

    With ntile=None (default) this is the DENSE-EQUIVALENT algorithmic
    count: every contraction of the textbook DF update at full size.
    This is the stable work definition used for cross-run throughput
    comparison — the same convention as the reference's own count, which
    likewise charges its symmetry-packed vvvv dgemm at the work it
    represents.

    With an integer ntile, returns the FLOPs the pair-tiled ladder
    (_ladder_df) actually EXECUTES: the two O(nv^4) ladder terms scale
    by npair/ntile^2 = (1 + 1/ntile)/2 because only tile pairs A >= B
    are evaluated (the A < B blocks are transposed mirrors), at the
    padded virtual dimension.

    NOTE: XLA's compiled.cost_analysis() undercounts lax.map bodies (it
    reports ONE trip of the tiled ladder, ~80x low at (H2O)8 shape), so
    throughput reporting must use this analytic count."""
    no, nv = nocc, nvir
    fl = 0.0
    if naux:
        if ntile:
            tsz = -(-nv // ntile)
            nvp = ntile * tsz
            frac = (ntile * (ntile + 1) / 2) / ntile**2
            fl += 2.0 * naux * nvp**4 * frac   # ladder W = Ld^T Ld, pairs
            fl += 2.0 * no**2 * nvp**4 * frac  # tau * Wvvvv, pairs
        else:
            fl += 2.0 * naux * nv**4           # ladder W (dense equivalent)
            fl += 2.0 * no**2 * nv**4          # tau * Wvvvv
        fl += 2.0 * naux * no**2 * nv**2 * 6  # ovvv-free factorized terms
        fl += 2.0 * naux * no * nv**2 * 4     # Ld dressing + small DF dots
    else:
        fl += 2.0 * no * nv**4 * 2          # materialized chi_vvvv dressing
        fl += 2.0 * no**2 * nv**4           # tau * Wvvvv
    fl += 2.0 * no**3 * nv**3 * 8           # rings: 4 Wvoov/Wvovo t2-builds
    #                                         + 4 t2 contractions
    fl += 2.0 * no**4 * nv**2 * 3           # Woooo build/use + quadratic fix
    fl += 2.0 * no**3 * nv**2 * 6 + 2.0 * no**2 * nv**3 * 2  # F/L closures
    return fl
