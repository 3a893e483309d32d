"""shard_map-tiled RCCSD update: sharded STORAGE *and* sharded COMPUTE.

The GSPMD layout in parallel.mesh shards the containers but lets XLA
gather full o^2v^2 intermediates per device (measured at (H2O)16-class
shape: args 5.0 GiB/device but temps 138.5 GiB/device — docs/DESIGN.md
"Capacity envelope").  This module is the explicit-collective
counterpart: every contraction of cc/rccsd.update_amps is re-derived so
that no device ever materializes a tensor larger than O(o^2 v^2 / N),
using

  * occupied-ROW shards: t2 / ovov / oovv sharded over their first
    occupied axis (index symmetries (ij|ab)=(ji|ba) etc. localize every
    occupied contraction to the shard),
  * ppermute RINGS for the two places a full occupied axis must meet a
    sharded one: building Wvoov/Wvovo/Woooo from ovov shards, and
    contracting them with t2 shards (the SUMMA pattern),
  * aux-LOCAL DF factor terms with one psum per o^2v^2/N-sized output,
  * a column-chunked LADDER: the dressed factor Ld stays aux-sharded at
    rest; column chunks are all_gathered transiently (never the full
    naux*nvir^2 factor) and every device contracts all virtual tile
    pairs against its own tau rows,
  * all_to_all transpose-EXCHANGES for the P(ij|ab) symmetrization
    (K + K^(jiba) needs rows the device does not own).

Reference counterpart: the blocked-HDF5 update loops of
pyscf/cc/ccsd.py:892 (update_amps) + the MPI-ready slicing hooks; the
capacity envelope to beat is the reference's ~100 occ / 1500 vir
out-of-core reach (/root/reference/FEATURES:74).

Cost notes (w16-class shape, N=8): per-device temps ~1.5 GiB-class vs
138.5 GiB under GSPMD; collectives per iteration ~= 2 rings of t2-shard
size + nchunk * full-Ld of all_gather + ~6 psums of shard size.  The
ladder W build is NOT divided by N (every device sweeps all tile pairs
for its own rows) — the deliberate capacity-over-flops tradeoff; at
w16 the extra W-build is ~naux/nocc_loc^... ~4x the per-device contract
cost and the iteration stays minutes-class where the unsharded update
cannot run at all.

Constraints (checked): nocc % N == 0; naux is zero-padded to a multiple
of N (zero aux rows contract to nothing); virtuals are zero-padded
inside the ladder exactly as in rccsd.pair_ladder_sym.

Only variant='ccsd' is implemented (CC2/CCD fit on one chip whenever
their t2 does; the tiled path exists for capacity, not variant
coverage).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map

from pyscf_mpcc_tpu.cc.eris import RERIs


# --------------------------------------------------------------- placement
def shard_eris_tiled(eris: RERIs, mesh, axis_name="dp"):
    """Place an RERIs container for the tiled update: o^2v^2 blocks
    row-sharded, Lvv aux-sharded (zero-padded to a device multiple),
    everything else replicated.  Returns a new RERIs of global arrays
    carrying NamedShardings."""
    N = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    row = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    naux = eris.Lov.shape[0]
    pad = (-naux) % N

    def padaux(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) \
            if pad else x

    return RERIs(
        fock=jax.device_put(eris.fock, repl),
        mo_energy=jax.device_put(eris.mo_energy, repl),
        oooo=jax.device_put(eris.oooo, repl),
        ovoo=jax.device_put(eris.ovoo, repl),
        ovov=jax.device_put(eris.ovov, row),
        oovv=jax.device_put(eris.oovv, row),
        ovvo=None,
        ovvv=None,
        vvvv=None,
        Lvv=jax.device_put(padaux(eris.Lvv), row),
        Lov=jax.device_put(padaux(eris.Lov), repl),
        Loo=None if eris.Loo is None
        else jax.device_put(padaux(eris.Loo), repl),
    )


def shard_amps_tiled(t1, t2, mesh, axis_name="dp"):
    return (jax.device_put(t1, NamedSharding(mesh, P())),
            jax.device_put(t2, NamedSharding(mesh, P(axis_name))))


# ------------------------------------------------------------- primitives
def _t_exchange(x, axis, N):
    """y[i_loc, j, a, b] = x[j, i_glob(i_loc), b, a] for row-sharded x:
    the cross-device part of the P(ij|ab) permutation.  all_to_all over
    the j axis re-shards x to column ownership, then the transpose is
    local."""
    # device d sends its j-block e to device e; receives x[i in e, j in d]
    y = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=0,
                           tiled=True)
    # y[u, w, a, b] = x[u_glob, j_my(w), a, b] with u now the full axis
    return jnp.transpose(y, (1, 0, 3, 2))


def _myslice(x, ax, d, size):
    """Dynamic block slice at offset d*size along axis ax."""
    starts = [jnp.int32(0)] * x.ndim
    starts[ax] = d * jnp.int32(size)
    sizes = list(x.shape)
    sizes[ax] = size
    return jax.lax.dynamic_slice(x, starts, sizes)


def _ladder_local(tau_sym, Ldl, axis, N, ntile, nchunk):
    """Half-ladder S_loc[i_loc, j, a, b] (A>=B tile blocks, diagonal
    halved) = the scan core of rccsd.pair_ladder_sym applied to the
    device's own tau rows, with the dressed factor gathered in column
    chunks (never the full naux*v^2 tensor at once).

    The caller applies S + exchange(S) — identical to pair_ladder_sym's
    post-scan symmetrization, split across devices."""
    nauxL, nvir = Ldl.shape[0], Ldl.shape[1]
    nol, no = tau_sym.shape[0], tau_sym.shape[1]
    ntile = max(nchunk, min(int(ntile), nvir))
    ntc = -(-ntile // nchunk)          # tiles per chunk
    ntile = ntc * nchunk
    tsz = -(-nvir // ntile)
    nvp = ntile * tsz
    padv = nvp - nvir
    if padv:
        Ldl = jnp.pad(Ldl, ((0, 0), (0, padv), (0, padv)))
        tau_p = jnp.pad(tau_sym, ((0, 0), (0, 0), (0, padv), (0, padv)))
    else:
        tau_p = tau_sym
    csz = ntc * tsz                    # columns per chunk

    def gather_chunk(g):
        blk = _myslice(Ldl, 1, jnp.int32(g), csz)     # (nauxL, csz, nvp)
        return jax.lax.all_gather(blk, axis, tiled=True)

    def tile_pairs(g1, g2):
        """Static (local tile a, local tile b) lists for a chunk pair."""
        if g1 == g2:
            return [(a, b) for a in range(ntc) for b in range(a + 1)]
        return [(a, b) for a in range(ntc) for b in range(ntc)]

    S = jnp.zeros((nol, no, nvp, nvp), tau_p.dtype)
    for g1 in range(nchunk):
        for g2 in range(g1 + 1):
            Ld1 = gather_chunk(g1)
            Ld2 = Ld1 if g1 == g2 else gather_chunk(g2)
            pairs = np.asarray(tile_pairs(g1, g2), dtype=np.int32)

            def pair_fn(ab, Ld1=Ld1, Ld2=Ld2, g1=g1, g2=g2):
                lda = jax.lax.dynamic_slice(
                    Ld1, (jnp.int32(0), ab[0] * tsz, jnp.int32(0)),
                    (Ld1.shape[0], tsz, nvp))
                ldb = jax.lax.dynamic_slice(
                    Ld2, (jnp.int32(0), ab[1] * tsz, jnp.int32(0)),
                    (Ld2.shape[0], tsz, nvp))
                w = jnp.einsum("Lac,Lbd->acbd", lda, ldb)
                blk = jnp.einsum("acbd,ijcd->ijab", w, tau_p)
                same = (g1 == g2) & (ab[0] == ab[1])
                return jnp.where(same, 0.5, 1.0).astype(blk.dtype) * blk

            block_fn = jax.checkpoint(pair_fn)

            def body(out, ab, g1=g1, g2=g2, block_fn=block_fn):
                blk = block_fn(ab)
                out = jax.lax.dynamic_update_slice(
                    out, blk,
                    (jnp.int32(0), jnp.int32(0),
                     (g1 * ntc + ab[0]) * tsz, (g2 * ntc + ab[1]) * tsz))
                return out, None

            S, _ = jax.lax.scan(body, S, jnp.asarray(pairs))
            # serialize chunk pairs: without this XLA overlaps all
            # nchunk^2/2 gathered factor pairs (see _update_local's
            # ring-barrier note)
            S = jax.lax.optimization_barrier(S)
    if padv:
        S = S[:, :, :nvir, :nvir]
    return S


# ---------------------------------------------------------- local update
def _update_local(t1, t2l, ovovl, oovvl, ovoo, oooo, Lov, Lvvl, fock,
                  mo_energy, *, nocc, nvir, N, axis, ntile, nchunk,
                  level_shift):
    """One RCCSD Jacobi sweep on device-local shards (runs under
    shard_map).  Index conventions follow cc/rccsd.update_amps term by
    term; every localization is justified inline by the integral /
    amplitude symmetry it uses."""
    d = jax.lax.axis_index(axis)
    oL = nocc // N
    nauxL = Lvvl.shape[0]
    fov = fock[:nocc, nocc:]
    foo = fock[:nocc, :nocc]
    fvv = fock[nocc:, nocc:]
    mo_e_o = mo_energy[:nocc]
    mo_e_v = mo_energy[nocc:] + level_shift
    perm = [(i, (i + 1) % N) for i in range(N)]

    def rows(x, ax=0, size=oL, who=None):
        return _myslice(x, ax, d if who is None else who, size)

    t1my = rows(t1)                       # (oL, v) rows i in d
    Lov_aux = rows(Lov, 0, nauxL)         # (nauxL, o, v) aux block d
    Lov_occ = rows(Lov, 1)                # (naux, oL, v) occ rows d
    taul = t2l + jnp.einsum("ia,jb->ijab", t1my, t1)

    # --- kappa intermediates (all o^2 / ov / v^2 — psum-reduced) -------
    # A: sum_{lcd} (kc|ld) t2[ilcd]; localize l via (kc|ld)=(ld|kc) and
    # t2[ilcd]=t2[lidc] — both first-axis local.
    kA = jnp.einsum("ldkc,lidc->ki", ovovl, t2l)
    kB = jnp.einsum("lckd,lidc->ki", ovovl, t2l)
    # x[kc] = (kc|ld) t1[ld]; z[kc] = (kd|lc) t1[ld] (localized forms)
    t1_l = t1my
    x_kc = jnp.einsum("ldkc,ld->kc", ovovl, t1_l)
    z_kc = jnp.einsum("lckd,ld->kc", ovovl, t1_l)
    # Fvv t2 terms: k local directly on both operands
    fA = jnp.einsum("kcld,klad->ac", ovovl, t2l)
    fB = jnp.einsum("kdlc,klad->ac", ovovl, t2l)
    kA, kB, x_kc, z_kc, fA, fB = jax.lax.psum(
        (kA, kB, x_kc, z_kc, fA, fB), axis)
    Fov = fov + 2.0 * x_kc - z_kc
    Foo = foo + 2.0 * kA - kB + jnp.einsum("kc,ic->ki",
                                           2.0 * x_kc - z_kc, t1)
    Fvv = fvv - 2.0 * fA + fB - jnp.einsum("kc,ka->ac",
                                           2.0 * x_kc - z_kc, t1)
    Foo_nd = Foo - jnp.diag(mo_e_o)
    Fvv_nd = Fvv - jnp.diag(mo_e_v)

    # lvv_t1 (the ovvv.t1 closure, DF-factorized; rccsd._OvvvOps.lvv_t1)
    z1 = jnp.einsum("Lkd,kd->L", Lov, t1)          # replicated, tiny
    u_lak = jnp.einsum("Lad,kd->Lak", Lvvl, t1)
    lvv_t1 = jax.lax.psum(
        2.0 * jnp.einsum("L,Lac->ac", rows(z1, 0, nauxL), Lvvl)
        - jnp.einsum("Lkc,Lak->ac", Lov_aux, u_lak), axis)

    Loo_i = Foo_nd + jnp.einsum("kc,ic->ki", fov, t1) \
        + 2.0 * jnp.einsum("lcki,lc->ki", ovoo, t1) \
        - jnp.einsum("kcli,lc->ki", ovoo, t1)
    Lvv_i = Fvv_nd - jnp.einsum("kc,ka->ac", fov, t1) + lvv_t1

    # --- T1 (Eq. 35) ----------------------------------------------------
    t1new = fov.conj().astype(t1.dtype)
    t1new -= 2.0 * jnp.einsum("kc,ka,ic->ia", fov, t1, t1)
    t1new += jnp.einsum("ac,ic->ia", Fvv_nd, t1)
    t1new -= jnp.einsum("ki,ka->ia", Foo_nd, t1)
    Fov_l = rows(Fov)
    # t2[kica]: k local directly; t2[ikca] = t2[kiac]
    g1 = 2.0 * jnp.einsum("kc,kica->ia", Fov_l, t2l)
    g1 -= jnp.einsum("kc,kiac->ia", Fov_l, t2l)
    # 2 (kc|ai) t1[kc]: ovvo[kcai] = (kc|ia) = ovov[k,c,i,a]
    g1 += 2.0 * jnp.einsum("kcia,kc->ia", ovovl, t1_l)
    g1 -= jnp.einsum("kiac,kc->ia", oovvl, t1_l)
    # ovvv.t2 terms (DF): x[Lic] = Lov[Lkd] t2[ikcd]; t2[ikcd]=t2[kidc]
    x_df = jnp.einsum("Lkd,kidc->Lic", Lov_occ, t2l)
    y_df = jnp.einsum("Lkc,kidc->Lid", Lov_occ, t2l)
    x_df, y_df = jax.lax.psum((x_df, y_df), axis)
    g1 += 2.0 * jnp.einsum("Lic,Lac->ia", rows(x_df, 0, nauxL), Lvvl)
    g1 -= jnp.einsum("Lid,Lad->ia", rows(y_df, 0, nauxL), Lvvl)
    # ovoo.t2: (lc|ki) t2[klac]: localize l: t2[klac] = t2[lkca]
    g1 -= 2.0 * jnp.einsum("lcki,lkca->ia", rows(ovoo), t2l)
    g1 += jnp.einsum("kcli,klac->ia", rows(ovoo), t2l)
    t1new += jax.lax.psum(g1, axis)
    t1new += jnp.einsum("ac,ic->ia", lvv_t1, t1)
    # ovoo.t1.t1 terms (ovoo replicated — computed replicated)
    m1 = jnp.einsum("lcki,lc->ki", ovoo, t1)
    m2 = jnp.einsum("kcli,lc->ki", ovoo, t1)
    t1new -= 2.0 * jnp.einsum("ki,ka->ia", m1, t1)
    t1new += jnp.einsum("ki,ka->ia", m2, t1)
    t1new += jnp.einsum("kc,ic,ka->ia", Fov, t1, t1)

    # --- ring A over ovov shards: Wvoov / Wvovo / Woooo(tmp) -----------
    # Wvoov[a,k,i_loc,c], Wvovo[a,k,c,i_loc] with the k axis FULL on the
    # device that owns the i_loc rows; tmp[k,l,i_loc,j] = (kc|ld) tau.
    Wvoov = jnp.transpose(ovovl, (1, 2, 0, 3))        # ovov[i,a,k,c]
    Wvovo = jnp.transpose(oovvl, (2, 1, 3, 0))        # oovv[i,k,a,c]
    # DF pieces.  The aux sum spans devices while the output keeps only
    # MY i rows, so a bare psum of aux-local x i-local partials would mix
    # other devices' i blocks into mine.  Instead: build the SMALL
    # aux-local factor over the FULL occupied axis, all_gather it (it is
    # O(naux o v), never O(naux v^2)), slice my rows, contract against
    # the replicated Lov — all local.
    #   Wvoov += sum_L Q[L,a,i] Lov[L,k,c],
    #   Q = Lvv.t1 (wvoov_t1) - (Lov.t1).t1 (the -(ld|kc)t1_id t1_la term)
    B2 = jnp.einsum("Lld,id->Lli", Lov_aux, t1)
    Q = jnp.einsum("Lad,id->Lai", Lvvl, t1) \
        - jnp.einsum("Lli,la->Lai", B2, t1)
    Qf = jax.lax.all_gather(Q, axis, tiled=True)
    Wvoov += jnp.einsum("Lai,Lkc->akic", rows(Qf, 2), Lov)
    #   Wvovo += sum_L x3[L,k,i] (Lvv - v1)[L,a,c]: the second factor is
    #   O(naux v^2) and stays aux-sharded — ring it instead of gathering.
    x3f = jax.lax.all_gather(
        jnp.einsum("Lkd,id->Lki", Lov_aux, t1), axis, tiled=True)
    x3me = rows(x3f, 2)                               # (naux, o, oL)
    v1 = jnp.einsum("Llc,la->Lac", Lov_aux, t1)
    Rbuf = Lvvl - v1
    wvovo_df = jnp.zeros((nvir, nocc, nvir, oL), t2l.dtype)
    # NOTE on the bar() calls threading every ring below: the unrolled
    # ring steps are data-independent except through the ppermute chain,
    # so without explicit ordering XLA schedules them concurrently and
    # every step's shard-sized partials are live at once (measured
    # 120 GiB/device of temps at w16 shape vs ~8 under the barriers —
    # the same lesson as rccsd.update_amps' barrier-pinned K chain).
    bar = jax.lax.optimization_barrier
    for s in range(N):
        blk = (d - s) % N
        wvovo_df += jnp.einsum(
            "Lki,Lac->akci", rows(x3me, 0, nauxL, blk), Rbuf)
        if s + 1 < N:
            Rbuf = jax.lax.ppermute(Rbuf, axis, perm)
            wvovo_df, Rbuf = bar((wvovo_df, Rbuf))
    Wvovo += wvovo_df
    # ovoo.t1 pieces (replicated integrals, my i rows)
    ovoo_i = rows(ovoo, 3)                            # (o, v, o, oL)
    Wvoov -= jnp.einsum("kcli,la->akic", ovoo_i, t1)
    Wvovo -= jnp.einsum("lcki,la->akci", ovoo_i, t1)

    Woooo = jnp.transpose(rows(oooo, 1), (0, 2, 1, 3))  # oooo[k,i,l,j]
    Woooo += jnp.einsum("lcki,jc->klij", ovoo_i, t1)
    Woooo += jnp.einsum("kclj,ic->klij", ovoo, t1my)

    tmp = jnp.zeros((nocc, nocc, oL, nocc), t2l.dtype)
    buf = ovovl
    for s in range(N):
        blk = (d - s) % N
        # ring terms of the chi intermediates: the shard rows of ovov
        # play the CONTRACTED occupied slot l via (kc|ld)=(ld|kc); the
        # t2 side slices its FULL second occupied axis at the block.
        t2il = rows(t2l, 1, oL, blk)                  # t2[i_loc, l@blk]
        Wvoov += (-0.5 * jnp.einsum("ldkc,ilda->akic", buf, t2il)
                  - 0.5 * jnp.einsum("lckd,ilad->akic", buf, t2il)
                  + jnp.einsum("ldkc,ilad->akic", buf, t2il))
        Wvovo -= 0.5 * jnp.einsum("lckd,ilda->akci", buf, t2il)
        # tmp[k@blk, l, i_loc, j] = (kc|ld) tau[ijcd] — the shard rows
        # play k, tau rows are local
        tmp_blk = jnp.einsum("kcld,ijcd->klij", buf, taul)
        tmp = jax.lax.dynamic_update_slice(
            tmp, tmp_blk, (blk * jnp.int32(oL), jnp.int32(0),
                           jnp.int32(0), jnp.int32(0)))
        if s + 1 < N:
            buf = jax.lax.ppermute(buf, axis, perm)
            Wvoov, Wvovo, tmp, buf = bar((Wvoov, Wvovo, tmp, buf))
    # Woooo = oooo-part + ovoo.t1 parts + (kc|ld) tau  (the explicit
    # (kc|ld) t1 t1 term of Eq. 42 and the (kc|ld) t2 term sum exactly
    # to the tau contraction)
    Woooo += tmp

    # --- ring B over t2 shards: the o^2v^2-output contractions ---------
    K = jnp.zeros_like(t2l)           # P(ij|ab)-symmetrized accumulator
    r2d = jnp.zeros_like(t2l)         # direct (already symmetric) part
    Loo_my = rows(Loo_i, 1)           # Loo[:, i_loc]
    buf = t2l
    for s in range(N):
        blk = (d - s) % N
        kb = blk * jnp.int32(oL)
        tau_s = buf + jnp.einsum("ia,jb->ijab", rows(t1, 0, oL, blk), t1)
        Wv_s = rows(Wvoov, 1, oL, blk)
        Wo_s = rows(Wvovo, 1, oL, blk)
        K += 2.0 * jnp.einsum("akic,kjcb->ijab", Wv_s, buf)
        K -= jnp.einsum("akci,kjcb->ijab", Wo_s, buf)
        K -= jnp.einsum("akic,kjbc->ijab", Wv_s, buf)
        K -= jnp.einsum("bkci,kjac->ijab", Wo_s, buf)
        K -= jnp.einsum("ki,kjab->ijab",
                        rows(Loo_my, 0, oL, blk), buf)
        r2d += jnp.einsum("klij,klab->ijab", rows(Woooo, 0, oL, blk),
                          tau_s)
        if s + 1 < N:
            buf = jax.lax.ppermute(buf, axis, perm)
            K, r2d, buf = bar((K, r2d, buf))

    # --- K light terms (all row-local; barrier-chained like the
    # unsharded update's K accumulation) ----------------------------------
    K = bar(K + jnp.einsum("ac,ijcb->ijab", Lvv_i, t2l))
    # t2_vvov_t1 (DF): sum_L Lov[L,i,a] (Lvv[L,c,b] t1[j,c]) — gather the
    # small aux-local factor, contract locally (see the Wvoov DF note)
    x4 = jax.lax.all_gather(
        jnp.einsum("Lcb,jc->Ljb", Lvvl, t1), axis, tiled=True)
    K = bar(K + jnp.einsum("Lia,Ljb->ijab", rows(Lov, 1), x4))
    # -(ki|bc) t1[ka] t1[jc]: (ki|bc) = (ik|bc) — first axis local
    K = bar(K - jnp.einsum("ikbc,ka,jc->ijab", oovvl, t1, t1))
    # -tmp2.t1: tmp2 = (ia|jk) + (kc|ai) t1[jc]; (kc|ai)=(ia|kc) local
    K = bar(K - jnp.einsum("iajk,kb->ijab", rows(ovoo), t1))
    K = bar(K - jnp.einsum("iakc,jc,kb->ijab", ovovl, t1, t1))

    # --- ladder + quadratic dressing fix --------------------------------
    tau_sym = 0.5 * (taul + _t_exchange(taul, axis, N))
    Ldl = Lvvl - jnp.einsum("ka,Lkc->Lac", t1, Lov_aux)
    S = _ladder_local(tau_sym, Ldl, axis, N, ntile, nchunk)
    # quadratic dressing artifact: tmp[k,l,i_loc,j] already holds
    # (kc|ld) tau[ijcd]
    r2d -= jnp.einsum("klij,ka,lb->ijab", tmp, t1, t1)

    # --- assemble --------------------------------------------------------
    KS = K + S
    t2new = KS + _t_exchange(KS, axis, N)
    t2new += jnp.transpose(ovovl.conj(), (0, 2, 1, 3))
    t2new += r2d

    eia = mo_e_o[:, None] - mo_e_v[None, :]
    d2l = rows(eia)[:, None, :, None] + eia[None, :, None, :]
    t1new = t1new / eia
    t2new = t2new / d2l
    return t1new, t2new


_UPDATE_CACHE = {}


def update_amps_tiled(t1, t2, eris: RERIs, mesh, axis_name="dp",
                      ntile=8, nchunk=2, level_shift=0.0):
    """One RCCSD Jacobi sweep with sharded compute (see module
    docstring).  t1 replicated, t2 row-sharded (shard_amps_tiled);
    eris from shard_eris_tiled.  Returns (t1new replicated, t2new
    row-sharded)."""
    N = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    nocc, nvir = t1.shape
    if nocc % N:
        raise ValueError(f"nocc={nocc} must divide the mesh size {N}")
    if eris.Lov.shape[0] % N:
        raise ValueError("aux axis not padded to the mesh size; build "
                         "the container with shard_eris_tiled")
    key = (id(mesh), axis_name, nocc, nvir, eris.Lov.shape[0],
           str(t2.dtype), ntile, nchunk, float(level_shift))
    fn = _UPDATE_CACHE.get(key)
    if fn is None:
        fn = build_update_fn(mesh, nocc, nvir, axis_name=axis_name,
                             ntile=ntile, nchunk=nchunk,
                             level_shift=level_shift)
        _UPDATE_CACHE[key] = fn
    return fn(t1, t2, eris.ovov, eris.oovv, eris.ovoo, eris.oooo,
              eris.Lov, eris.Lvv, eris.fock, eris.mo_energy)


def build_update_fn(mesh, nocc, nvir, axis_name="dp", ntile=8, nchunk=2,
                    level_shift=0.0):
    """The jitted shard_map update as a callable of
    (t1, t2, ovov, oovv, ovoo, oooo, Lov, Lvv, fock, mo_energy) global
    arrays — exposed so tools can AOT-lower it at capacity shapes
    (tools/w16_shard_probe.py) without data."""
    N = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    pr = P(axis_name)
    pn = P()
    body = partial(_update_local, nocc=nocc, nvir=nvir, N=N,
                   axis=axis_name, ntile=ntile, nchunk=nchunk,
                   level_shift=level_shift)
    import inspect
    ck = ("check_vma" if "check_vma"
          in inspect.signature(shard_map).parameters else "check_rep")
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(pn, pr, pr, pr, pn, pn, pn, pr, pn, pn),
        out_specs=(pn, pr), **{ck: False}))


def energy_tiled(t1, t2, eris: RERIs):
    """CCSD correlation energy on the sharded containers (row shardings
    line up elementwise, XLA inserts the reduction collectives)."""
    nocc = t1.shape[0]
    fov = eris.fock[:nocc, nocc:]
    tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1)
    e = 2.0 * jnp.einsum("ia,ia->", fov, t1)
    e += 2.0 * jnp.einsum("ijab,iajb->", tau, eris.ovov)
    e -= jnp.einsum("ijab,ibja->", tau, eris.ovov)
    return e


def kernel_tiled(eris: RERIs, mesh, axis_name="dp", max_cycle=50,
                 conv_tol=1e-8, conv_tol_normt=1e-6, diis_space=6,
                 ntile=8, nchunk=2, verbose=0):
    """Host-driven CCSD iteration over the tiled update with host DIIS
    on the sharded amplitude vector (ring stored as np arrays; each
    cycle moves one t2 of data host<->device — the tradeoff for a ring
    that never occupies HBM).  Returns (converged, e_corr, t1, t2)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    nocc = eris.oooo.shape[0]
    fov = eris.fock[:nocc, nocc:]
    eo = eris.mo_energy[:nocc]
    ev = eris.mo_energy[nocc:]
    eia = eo[:, None] - ev[None, :]
    d2 = eia[:, None, :, None] + eia[None, :, None, :]
    t1 = fov / eia
    t2 = eris.ovov.transpose(0, 2, 1, 3) / d2
    t1, t2 = shard_amps_tiled(t1, t2, mesh, axis_name)
    nvir = t1.shape[1]
    diis = DIIS(space=diis_space)
    e_last = float(energy_tiled(t1, t2, eris))
    converged = False
    e = e_last
    row = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    for it in range(max_cycle):
        t1n, t2n = update_amps_tiled(t1, t2, eris, mesh, axis_name,
                                     ntile=ntile, nchunk=nchunk)
        normt = float(jnp.linalg.norm(t1n - t1)
                      + jnp.linalg.norm(t2n - t2))
        vec = np.concatenate([np.asarray(t1n).ravel(),
                              np.asarray(t2n).ravel()])
        vec = diis.update(vec)
        t1 = jax.device_put(
            jnp.asarray(vec[: nocc * nvir].reshape(nocc, nvir),
                        t1n.dtype), repl)
        t2 = jax.device_put(
            jnp.asarray(vec[nocc * nvir:].reshape(t2n.shape), t2n.dtype),
            row)
        e = float(energy_tiled(t1, t2, eris))
        log.info("cycle %2d  E_corr(tiled RCCSD) = %.14f  dE = %10.3e  "
                 "|dt| = %9.3e", it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return converged, e, t1, t2
