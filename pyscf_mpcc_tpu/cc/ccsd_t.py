"""Closed-shell CCSD(T) — perturbative triples on TPU.

TPU-native re-design of the reference (T) engine (pyscf/cc/ccsd_t.py:34 +
lib/cc/ccsd_t.c:39-378): the OpenMP loop over (a,b,c) triples with per-triple
dgemms becomes a lax.scan over *tiles* of the lower-triangular (a>=b>=c)
virtual-triple space, where each tile evaluates the six jointly-permuted
W contributions as two large MXU matmuls each:

    w[x,y,z,i,j,k] = sum_f (ix|fy) t2[k,j,z,f] - sum_m (ix|jm) t2[k,m,z,y]

with (ix|fy) reconstructed on the fly from DF factors (no O(nocc nvir^3)
ovvv storage), the 4/1/1/-2/-2/-2 permutation combine of the energy
functional (ccsd_t.c add_and_permute), degeneracy weights replacing the
reference's a==b/b==c special cases, and per-tile energies accumulated in
fp64.  All shapes static; virtuals zero-padded to a tile multiple.

E(T) = 2 * sum_{a>=b>=c} weight(abc) sum_ijk W * Z / D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _tile_triples(nvt):
    """All (ta >= tb >= tc) tile-index triples as an (n, 3) int array."""
    out = [(a, b, c)
           for a in range(nvt) for b in range(a + 1) for c in range(b + 1)]
    return np.asarray(out, dtype=np.int32)


# compiled-scan cache: kernel() builds its jitted tile scan once per static
# configuration (retracing + Mosaic re-lowering per call costs seconds —
# measured ~7 ms/tile of pure overhead on a 512-tile probe)
_SCAN_CACHE = {}


def kernel(t1, t2, eris, tile=8, dtype=None, tiles_per_call=2048,
           act_hole=None, act_particle=None, mode="exclude_active",
           mesh=None, engine="auto", dot_precision=None, chunk=1,
           vfac=1.0):
    """E(T) from converged (t1, t2) and an RERIs container (DF or full).

    Requires Lov/Lvv when ovvv is absent; ovoo/ovov/fock always.
    tiles_per_call bounds the runtime of each compiled scan (long single
    XLA programs can trip device execution watchdogs); the same compiled
    executable is reused across chunks.

    act_hole/act_particle restrict the energy sum: 'exclude_active' drops
    contributions whose six indices are all active (the fork's inactive/
    environment triples correction), 'only_active' keeps only those.

    engine: 'xla' keeps the whole tile (matmuls + permutation combine) in
    XLA; 'fused' runs the six w-building dots in XLA and the permutation
    epilogue in the Pallas kernel (ops/triples_combine.py) — the
    production TPU path, ~10x less HBM traffic per tile.  'auto' picks
    'fused' on TPU backends and 'xla' elsewhere (the Pallas kernel runs
    in interpret mode off-TPU, which is test-only speed).

    dot_precision: per-dot precision for the XLA-side W contractions
    ('high' = bf16x3, 'highest' = true fp32), independent of the global
    jax_default_matmul_precision.  When set, the small in-kernel w2 dots
    run at HIGHEST (Mosaic lowers only DEFAULT/HIGHEST).  A one-shot (T)
    energy has no iteration to clean single-pass-bf16 rounding, so
    production runs need 'high' or 'highest' here (or the global flag).

    chunk: tiles per pallas_call in the fused engine.  The scan stacks K
    tiles of XLA prep, then ONE kernel launch with grid (K, T, T).
    Default 1: the round-5 hardware sweep measured K1 FASTER than K4/K8
    at production shape (9.91 vs 7.36 TFLOP/s dot-high) AND K>1 holds
    K stacked W streams live, which pushed the full (H2O)8 (T) program
    447 MiB past HBM (chunk=8 compile OOM, round-5).
    processes them — amortizing the ~6 ms/tile dispatch the round-3
    roofline measured for one-call-per-tile.  chunk=1 recovers the
    per-tile form (still used on the mesh path).  HBM cost: K stacked
    W streams (6·T³·nocc³ elements each).
    """
    from pyscf_mpcc_tpu.lib.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    nocc, nvir = t1.shape
    if dtype is None:
        dtype = t2.dtype
    if isinstance(dot_precision, str):
        dot_precision = jax.lax.Precision[dot_precision.upper()]
    prec = dot_precision
    kprec = None if prec is None else jax.lax.Precision.HIGHEST
    if not tile:
        # HBM governor sizes the tile edge (reference counterpart: the
        # max_memory-driven blksize of ccsd_t.c's caller, misc.py:113)
        from pyscf_mpcc_tpu.lib import memory as _mem
        naux = eris.Lov.shape[0] if eris.Lov is not None else 0
        tile = _mem.plan_triples_tile(nocc, nvir, naux, dtype)
    f = eris.fock
    eo = eris.mo_energy[:nocc].astype(dtype)
    ev = eris.mo_energy[nocc:].astype(dtype)
    fvo = f[nocc:, :nocc].astype(dtype)

    # pad virtuals to a tile multiple; padded ev large so denominators are
    # finite, padded tensors zero so contributions vanish
    nvp = ((nvir + tile - 1) // tile) * tile
    pad = nvp - nvir

    def padv(x, axes):
        cfg = [(0, 0)] * x.ndim
        for ax in axes:
            cfg[ax] = (0, pad)
        return jnp.pad(x, cfg) if pad else x

    ev_p = jnp.concatenate([ev, jnp.full((pad,), 1e6, dtype)]) if pad else ev
    t1p = padv(t1.astype(dtype), [1])
    fvo_p = padv(fvo, [0])
    if vfac != 1.0:
        # QCISD(T): the disconnected-singles V term enters with weight
        # vfac=2 (reference lib/cc/ccsd_t.c:478 QCIsd_t_contract fac=2.0,
        # JCP 94, 442).  t1p/fvo_p feed ONLY the V term in every engine,
        # so scaling them here applies V = W + vfac*v uniformly.
        t1p = t1p * jnp.asarray(vfac, dtype)
        fvo_p = fvo_p * jnp.asarray(vfac, dtype)
    # TPU layout note: a trailing axis of size nocc (~32) pads 4x to the
    # 128-lane tile, so all persistent tensors keep a fused occupied-pair
    # axis (nocc^2 >= 128) or the virtual axis last.
    if engine == "auto":
        # v5e measurement at (H2O)8 shape, dot-high, 512-tile probe:
        # fused:K1 9.91 TFLOP/s vs flat:K1 6.37 / flat:K8 6.22 — the flat
        # layout's in-kernel 32-lane cell slices are cross-lane relayouts
        # that cost more than the 4x padded-DMA traffic they avoid
        # (round-5 sweep; see docs/PARITY.md "(T) engine roofline")
        engine = "fused" if jax.default_backend() == "tpu" else "xla"
    if engine not in ("fused", "flat", "xla", "resident"):
        # the round-2/3 engine study variants (fused2/3/4) were retired
        # after the roofline settled the design (docs/PARITY.md "(T)
        # engine roofline"); 'fused' is the per-tile epilogue kernel,
        # 'flat' (round 5) is fused with UNPADDED W streams (the 6D
        # streams' (o,o) minor stores/moves 4.0x lane-padded; flat fuses
        # the column tile dim into the minor — measured the production
        # default), 'resident' (round 4) moves the W dots inside the
        # kernel (does not Mosaic-compile at production shape on the
        # remote-compile runtime; retained for study)
        raise ValueError(f"unknown (T) engine {engine!r}; use 'fused', "
                         "'flat', 'resident', 'xla' or 'auto'")
    flat = engine == "flat"
    if flat:
        engine = "fused"

    # t2T[c, f, (j,k)] = t2[k, j, c, f]
    t2T = padv(t2.astype(dtype).transpose(2, 3, 1, 0), [0, 1])
    t2T = t2T.reshape(t2T.shape[0], t2T.shape[1], nocc * nocc)
    # vooo[a, i, (j,m)] = (ia|jm)
    vooo = padv(eris.ovoo.astype(dtype).transpose(1, 0, 2, 3), [0])
    vooo = vooo.reshape(vooo.shape[0], nocc, nocc * nocc)
    if engine in ("fused", "resident"):
        # tile-axes-leading oovv_T[x, y, i, j] = (ix|jy) for the kernels;
        # the swapped-pair layout t2Ts[c, f, (k,j)] only feeds the fused
        # engine's canonical-emission dots (the resident kernel derives
        # every perm from the jk layout alone)
        if engine == "fused":
            t2Ts = padv(t2.astype(dtype).transpose(2, 3, 0, 1), [0, 1])
            t2Ts = t2Ts.reshape(t2Ts.shape[0], t2Ts.shape[1], nocc * nocc)
        else:
            t2Ts = None
        # stored with the (i, j) pair FUSED: the 4D (nvp, nvp, o, o)
        # form lives 4.0x lane-padded in HBM at production occupancy
        # (measured 2.74 GiB for a 702 MiB tensor); preps re-split the
        # minor on their small per-tile slices
        oovv_T = padv(eris.ovov.astype(dtype).transpose(1, 3, 0, 2), [0, 1])
        oovv_T = oovv_T.reshape(nvp, nvp, nocc * nocc)
        oovv_r = None
    else:
        # oovv[i, j, x, y] = (ix|jy): tile slices address the two minor axes
        oovv_r = padv(eris.ovov.astype(dtype).transpose(0, 2, 1, 3), [2, 3])
        t2Ts = oovv_T = None
    if eris.Lov is not None:
        Lov = padv(eris.Lov.astype(dtype), [2])
        Lvv = padv(eris.Lvv.astype(dtype), [1, 2])
        ovvv = None
    else:
        ovvv = padv(eris.ovvv.astype(dtype), [1, 2, 3])
        Lov = Lvv = None

    trips = jnp.asarray(_tile_triples(nvp // tile))

    if act_hole is not None:
        ao_m = np.zeros(nocc, dtype=bool)
        ao_m[np.asarray(act_hole, dtype=int)] = True
        av_m = np.zeros(nvp, dtype=bool)
        av_m[np.asarray(act_particle, dtype=int)] = True
        act_occ = jnp.asarray(ao_m, dtype)
        act_vir = jnp.asarray(av_m, dtype)
    else:
        act_occ = act_vir = None

    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]

    o = nocc
    T = tile

    # The large tensors are passed to the jitted chunk functions as
    # ARGUMENTS (a dict pytree).  Closing over them would embed gigabytes
    # of constants into the lowered HLO — which is what used to break the
    # remote compile at production scale.
    big_arrays = dict(t2T=t2T, vooo=vooo, t1p=t1p,
                      fvo_p=fvo_p, ev_p=ev_p, eo=eo)
    if engine == "fused":
        big_arrays["t2Ts"] = t2Ts
        big_arrays["oovv_T"] = oovv_T
    elif engine == "resident":
        big_arrays["oovv_T"] = oovv_T
    else:
        big_arrays["oovv_r"] = oovv_r
    if ovvv is not None:
        big_arrays["ovvv"] = ovvv
    else:
        big_arrays["Lov"] = Lov
        big_arrays["Lvv"] = Lvv
    if act_occ is not None:
        big_arrays["act_occ"] = act_occ
        big_arrays["act_vir"] = act_vir

    oo = o * o

    def make_tile_energy(big):
        t2T = big["t2T"]
        vooo = big["vooo"]
        oovv_r = big["oovv_r"]
        t1p = big["t1p"]
        fvo_p = big["fvo_p"]
        ev_p = big["ev_p"]
        eo = big["eo"]
        ovvv = big.get("ovvv")
        Lov = big.get("Lov")
        Lvv = big.get("Lvv")
        act_occ = big.get("act_occ")
        act_vir = big.get("act_vir")

        def ov_block(x0, y0):
            zi32 = jnp.int32(0)
            if ovvv is not None:
                blk = jax.lax.dynamic_slice(
                    ovvv, (zi32, x0, zi32, y0), (o, T, nvp, T))
                return blk.transpose(1, 3, 0, 2)
            lo = jax.lax.dynamic_slice(Lov, (zi32, zi32, x0),
                                       (Lov.shape[0], o, T))
            lv = jax.lax.dynamic_slice(Lvv, (zi32, zi32, y0),
                                       (Lvv.shape[0], nvp, T))
            return jnp.einsum("Lix,Lfy->xyif", lo, lv,
                              preferred_element_type=dtype,
                              precision=prec)

        return _tile_energy_body(ov_block, t2T, vooo, oovv_r, t1p, fvo_p,
                                 ev_p, eo, act_occ, act_vir)

    def _tile_energy_body(ov_block, t2T, vooo, oovv_r, t1p, fvo_p, ev_p, eo,
                          act_occ, act_vir):
      def tile_energy(carry, abc):
        zi32 = jnp.int32(0)
        a0, b0, c0 = (jnp.int32(abc[0] * T), jnp.int32(abc[1] * T),
                      jnp.int32(abc[2] * T))
        starts = (a0, b0, c0)

        t2T_s = [jax.lax.dynamic_slice(t2T, (s, zi32, zi32), (T, nvp, oo))
                 for s in starts]
        vooo_s = [jax.lax.dynamic_slice(vooo, (s, zi32, zi32), (T, o, oo))
                  for s in starts]
        # ov blocks for the 6 ordered (x, y) role pairs
        ovb = {}
        for (xi, yi) in set((p[0], p[1]) for p in perms):
            ovb[(xi, yi)] = ov_block(starts[xi], starts[yi])

        W = jnp.zeros((T, T, T, o, o, o), dtype)
        V = jnp.zeros((T, T, T, o, o, o), dtype)
        for p in perms:
            xi, yi, zi = p
            # w1[x,y,z,i,(j,k)] = sum_f ov[x,y,i,f] t2T[z,f,(j,k)]
            w = jnp.einsum("xyif,zfm->xyzim", ovb[(xi, yi)], t2T_s[zi],
                           preferred_element_type=dtype, precision=prec)
            w = w.reshape(T, T, T, o, o, o)
            # w2[x,y,z,i,j,k] = sum_m vooo[x,i,(j,m)] t2[k,m,z,y];
            # t2[k,m,z,y] = t2T[z,y,(m,k)] (t2T pair axis is (j',k')=(m,k))
            t2zy = jax.lax.dynamic_slice(
                t2T_s[zi], (zi32, starts[yi], zi32), (T, T, oo)
            ).reshape(T, T, o, o)
            w -= jnp.einsum("xijm,zymk->xyzijk",
                            vooo_s[xi].reshape(T, o, o, o), t2zy,
                            preferred_element_type=dtype, precision=prec)
            # v[x,y,z,i,j,k] = (ix|jy) t1[k,z]/2 + t2T[y,x,i,j] fvo[z,k]/2
            oovv_xy = jax.lax.dynamic_slice(
                oovv_r, (zi32, zi32, starts[xi], starts[yi]), (o, o, T, T))
            t1z = jax.lax.dynamic_slice(t1p, (zi32, starts[zi]), (o, T))
            fvoz = jax.lax.dynamic_slice(fvo_p, (starts[zi], zi32), (T, o))
            # t2T[y,x,(i,j)] = t2[j,i,y,x]; want v2[...,i,j] = t2[j,i,y,x]
            t2yx = jax.lax.dynamic_slice(
                t2T_s[yi], (zi32, starts[xi], zi32), (T, T, oo)
            ).reshape(T, T, o, o)
            v = 0.5 * (jnp.einsum("ijxy,kz->xyzijk", oovv_xy, t1z)
                       + jnp.einsum("yxij,zk->xyzijk", t2yx, fvoz))
            # joint inverse permutation back to (a,b,c)/(i,j,k) roles
            inv = [p.index(0), p.index(1), p.index(2)]
            axes = tuple(inv) + tuple(3 + q for q in inv)
            W += jnp.transpose(w, axes)
            V += jnp.transpose(v, axes)

        V = V + W
        # Z = 4V + V(jki) + V(kij) - 2V(kji) - 2V(ikj) - 2V(jik)  [ijk axes]
        Z = (4.0 * V
             + V.transpose(0, 1, 2, 4, 5, 3)
             + V.transpose(0, 1, 2, 5, 3, 4)
             - 2.0 * V.transpose(0, 1, 2, 5, 4, 3)
             - 2.0 * V.transpose(0, 1, 2, 3, 5, 4)
             - 2.0 * V.transpose(0, 1, 2, 4, 3, 5))

        av = jax.lax.dynamic_slice(ev_p, (a0,), (T,))
        bv = jax.lax.dynamic_slice(ev_p, (b0,), (T,))
        cv = jax.lax.dynamic_slice(ev_p, (c0,), (T,))
        eabc = (av[:, None, None] + bv[None, :, None] + cv[None, None, :])
        eijk = (eo[:, None, None] + eo[None, :, None] + eo[None, None, :])
        denom = (eijk[None, None, None] - eabc[:, :, :, None, None, None])

        # degeneracy weight on global indices
        ga = a0 + jnp.arange(T)
        gb = b0 + jnp.arange(T)
        gc = c0 + jnp.arange(T)
        A = ga[:, None, None]
        B = gb[None, :, None]
        C = gc[None, None, :]
        wgt = jnp.where((A > B) & (B > C), 1.0,
                        jnp.where((A == B) & (B == C), 1.0 / 6.0,
                                  jnp.where((A >= B) & (B >= C), 0.5, 0.0)))
        wgt = wgt.astype(dtype)

        zd = Z / denom
        if act_occ is not None:
            ax = jax.lax.dynamic_slice(act_vir, (a0,), (T,))
            ay = jax.lax.dynamic_slice(act_vir, (b0,), (T,))
            az = jax.lax.dynamic_slice(act_vir, (c0,), (T,))
            act6 = (ax[:, None, None, None, None, None]
                    * ay[None, :, None, None, None, None]
                    * az[None, None, :, None, None, None]
                    * act_occ[None, None, None, :, None, None]
                    * act_occ[None, None, None, None, :, None]
                    * act_occ[None, None, None, None, None, :])
            zd = zd * ((1.0 - act6) if mode == "exclude_active" else act6)
        e_tile = jnp.einsum("xyzijk,xyzijk->xyz", W, zd)
        e = jnp.sum((e_tile * wgt).astype(carry.dtype))
        return carry + e, e

      return tile_energy

    def make_prep_fused(big, flat=False):
        """Per-tile XLA prep for the Pallas epilogue: six canonical-
        emission W dots (ops/triples_combine.W_PLAN) + the small per-tile
        slices, returned as one tuple.  Shared by the per-tile scan body
        (mesh path) and the grid-batched chunk path, where lax.scan
        stacks these outputs with a leading chunk axis.  flat=True emits
        the W streams in the unpadded flat layout (emit_w_dot_flat)."""
        from pyscf_mpcc_tpu.ops.triples_combine import (
            PERMS, W_PLAN, emit_w_dot, emit_w_dot_flat)
        emit = emit_w_dot_flat if flat else emit_w_dot
        t2T = big["t2T"]
        t2Ts = big["t2Ts"]
        vooo = big["vooo"]
        oovv_T = big["oovv_T"]
        t1p = big["t1p"]
        fvo_p = big["fvo_p"]
        ev_p = big["ev_p"]
        ovvv = big.get("ovvv")
        Lov = big.get("Lov")
        Lvv = big.get("Lvv")
        act_vir = big.get("act_vir")
        zi32 = jnp.int32(0)

        def prep(abc):
            starts = tuple(jnp.int32(abc[r] * T) for r in range(3))
            if ovvv is None:
                lo = [jax.lax.dynamic_slice(
                    Lov, (zi32, zi32, s), (Lov.shape[0], o, T))
                    for s in starts]
                lv = [jax.lax.dynamic_slice(
                    Lvv, (zi32, zi32, s), (Lvv.shape[0], nvp, T))
                    for s in starts]
            ovb = {}
            for (xi, yi) in set((p[0], p[1]) for p in PERMS):
                if ovvv is not None:
                    blk = jax.lax.dynamic_slice(
                        ovvv, (zi32, starts[xi], zi32, starts[yi]),
                        (o, T, nvp, T))
                    ovb[(xi, yi)] = blk.transpose(1, 3, 0, 2)
                else:
                    ovb[(xi, yi)] = jnp.einsum(
                        "Lix,Lfy->xyif", lo[xi], lv[yi],
                        preferred_element_type=dtype, precision=prec)
            t2T_sl = {("jk", r): jax.lax.dynamic_slice(
                t2T, (s, zi32, zi32), (T, nvp, oo))
                for r, s in enumerate(starts)}
            t2T_sl.update({("kj", r): jax.lax.dynamic_slice(
                t2Ts, (s, zi32, zi32), (T, nvp, oo))
                for r, s in enumerate(starts)})
            w_list = tuple(emit(p, ovb[(p[0], p[1])],
                                t2T_sl[(W_PLAN[p]["t2"], p[2])],
                                dtype, T, o, precision=prec)
                           for p in PERMS)
            vooo_t = jnp.stack([jax.lax.dynamic_slice(
                vooo, (s, zi32, zi32), (T, o, oo)).reshape(T, oo, o)
                for s in starts])
            t2p = jnp.stack([jnp.stack([jax.lax.dynamic_slice(
                t2T, (s1, s2, zi32), (T, T, oo)).reshape(T, T, o, o)
                for s2 in starts]) for s1 in starts])
            oovv_t = jnp.stack([jnp.stack([jax.lax.dynamic_slice(
                oovv_T, (s1, s2, zi32), (T, T, oo)).reshape(T, T, o, o)
                for s2 in starts]) for s1 in starts])
            t1_t = jnp.stack([jax.lax.dynamic_slice(
                t1p, (zi32, s), (o, T)).T[:, None, :] for s in starts])
            fvo_t = jnp.stack([jax.lax.dynamic_slice(
                fvo_p, (s, zi32), (T, o))[:, None, :] for s in starts])
            t1c_t = jnp.stack([jax.lax.dynamic_slice(
                t1p, (zi32, s), (o, T)).T[:, :, None] for s in starts])
            fvoc_t = jnp.stack([jax.lax.dynamic_slice(
                fvo_p, (s, zi32), (T, o))[:, :, None] for s in starts])
            evt = jnp.stack([jax.lax.dynamic_slice(ev_p, (s,), (T,))
                             for s in starts])
            gabc = jnp.stack([s + jnp.arange(T, dtype=jnp.int32)
                              for s in starts])
            actv = None
            if act_vir is not None:
                actv = jnp.stack([jax.lax.dynamic_slice(
                    act_vir, (s,), (T,)) for s in starts])
            return (w_list, vooo_t, t2p, oovv_t, t1_t, fvo_t, t1c_t,
                    fvoc_t, gabc, evt) + ((actv,) if actv is not None
                                          else ())
        return prep

    def _fused_shared(big):
        eo_ = big["eo"]
        eijk = (eo_[:, None, None] + eo_[None, :, None]
                + eo_[None, None, :])
        act_occ = big.get("act_occ")
        actocc3 = None
        if act_occ is not None:
            actocc3 = (act_occ[:, None, None] * act_occ[None, :, None]
                       * act_occ[None, None, :])
        return eijk, actocc3

    def make_tile_energy_fused(big, interpret=False, flat=False):
        """Per-tile scan body (one pallas_call per tile): retained for
        the mesh-sharded path; the single-chip driver uses the
        grid-batched chunk form below (~6 ms/tile dispatch amortized)."""
        from pyscf_mpcc_tpu.ops.triples_combine import tile_energy_fused
        prep = make_prep_fused(big, flat=flat)
        eijk, actocc3 = _fused_shared(big)
        has_act = big.get("act_occ") is not None

        def tile_energy(carry, abc):
            out = prep(abc)
            (w_list, vooo_t, t2p, oovv_t, t1_t, fvo_t, t1c_t, fvoc_t,
             gabc, evt) = out[:10]
            kw = dict(interpret=interpret, kern_precision=kprec,
                      flat=flat)
            if has_act:
                kw.update(actv=out[10], actocc=actocc3, act_mode=mode)
            e = tile_energy_fused(w_list, vooo_t, t2p, oovv_t, t1_t,
                                  fvo_t, t1c_t, fvoc_t, eijk, gabc, evt,
                                  **kw)
            return carry + e.astype(carry.dtype), e

        return tile_energy

    def make_prep_resident(big, rmode):
        """Per-tile XLA prep for the resident kernel: operand slices only
        (the W dots run in-kernel), hi/lo bf16-split for rmode='split'."""
        from pyscf_mpcc_tpu.ops.triples_resident import (
            PAIRS6, PAIRS9, hilo)
        t2T = big["t2T"]
        vooo = big["vooo"]
        oovv_T = big["oovv_T"]
        t1p = big["t1p"]
        fvo_p = big["fvo_p"]
        ev_p = big["ev_p"]
        ovvv = big.get("ovvv")
        Lov = big.get("Lov")
        Lvv = big.get("Lvv")
        act_vir = big.get("act_vir")
        zi32 = jnp.int32(0)

        def conv(x):
            if rmode == "split":
                return hilo(x)
            if rmode == "bf16":
                return x.astype(jnp.bfloat16)
            return x

        def prep(abc):
            starts = tuple(jnp.int32(abc[r] * T) for r in range(3))
            if ovvv is None:
                lo = [jax.lax.dynamic_slice(
                    Lov, (zi32, zi32, s), (Lov.shape[0], o, T))
                    for s in starts]
                lv = [jax.lax.dynamic_slice(
                    Lvv, (zi32, zi32, s), (Lvv.shape[0], nvp, T))
                    for s in starts]
            ovbl = []
            for (xi, yi) in PAIRS6:
                if ovvv is not None:
                    blk = jax.lax.dynamic_slice(
                        ovvv, (zi32, starts[xi], zi32, starts[yi]),
                        (o, T, nvp, T))
                    ovbl.append(conv(blk.transpose(1, 3, 0, 2)))
                else:
                    ovbl.append(conv(jnp.einsum(
                        "Lix,Lfy->xyif", lo[xi], lv[yi],
                        preferred_element_type=dtype, precision=prec)))
            t2sl = [conv(jax.lax.dynamic_slice(
                t2T, (s, zi32, zi32), (T, nvp, oo))) for s in starts]
            vooo_t = jnp.stack([jax.lax.dynamic_slice(
                vooo, (s, zi32, zi32), (T, o, oo)).reshape(T, oo, o)
                for s in starts])
            t2p9 = jnp.stack([jax.lax.dynamic_slice(
                t2T, (starts[r1], starts[r2], zi32),
                (T, T, oo)).reshape(T, T, o, o) for (r1, r2) in PAIRS9])
            oovv9 = jnp.stack([jax.lax.dynamic_slice(
                oovv_T, (starts[r1], starts[r2], zi32),
                (T, T, o * o)).reshape(T, T, o, o)
                for (r1, r2) in PAIRS9])
            t1_t = jnp.stack([jax.lax.dynamic_slice(
                t1p, (zi32, s), (o, T)).T for s in starts])
            fvo_t = jnp.stack([jax.lax.dynamic_slice(
                fvo_p, (s, zi32), (T, o)) for s in starts])
            ev3 = [jax.lax.dynamic_slice(ev_p, (s,), (T,)) for s in starts]
            eabc3 = (ev3[0][:, None, None] + ev3[1][None, :, None]
                     + ev3[2][None, None, :])
            g3 = [s + jnp.arange(T, dtype=jnp.int32) for s in starts]
            ga = g3[0][:, None, None]
            gb = g3[1][None, :, None]
            gc = g3[2][None, None, :]
            wgt3 = jnp.where(
                (ga > gb) & (gb > gc), 1.0,
                jnp.where((ga == gb) & (gb == gc), 1.0 / 6.0,
                          jnp.where((ga >= gb) & (gb >= gc), 0.5,
                                    0.0))).astype(dtype)
            out = (t2sl, ovbl, vooo_t, t2p9, oovv9, t1_t, fvo_t, eabc3,
                   wgt3)
            if act_vir is not None:
                a3 = [jax.lax.dynamic_slice(act_vir, (s,), (T,))
                      for s in starts]
                act3 = (a3[0][:, None, None] * a3[1][None, :, None]
                        * a3[2][None, None, :]).astype(dtype)
                out = out + (act3,)
            return out
        return prep

    def make_tile_energy_resident(big, rmode, interpret=False):
        """Per-tile scan body for the resident engine (one pallas_call
        per tile, grid (T,) over the a-virtuals)."""
        from pyscf_mpcc_tpu.ops.triples_resident import (
            tile_energy_resident)
        prep = make_prep_resident(big, rmode)
        eijk, actocc3 = _fused_shared(big)
        has_act = big.get("act_occ") is not None

        def tile_energy(carry, abc):
            out = prep(abc)
            (t2sl, ovbl, vooo_t, t2p9, oovv9, t1_t, fvo_t, eabc3,
             wgt3) = out[:9]
            kw = dict(interpret=interpret, mode=rmode)
            if has_act:
                kw.update(act3=out[9], actocc=actocc3.astype(dtype),
                          act_mode=mode)
            e = tile_energy_resident(t2sl, ovbl, vooo_t, t2p9, oovv9,
                                     t1_t, fvo_t, eijk, eabc3, wgt3, **kw)
            return carry + e.astype(carry.dtype), e

        return tile_energy

    def make_chunk_energy_fused(big, interpret=False, flat=False):
        """Grid-batched chunk body: lax.scan stacks K tiles of prep
        outputs, then ONE pallas_call with grid (K, T, T) processes the
        whole chunk (tile_energy_fused_chunk) — the reference's
        one-OpenMP-region-for-all-abc-jobs amortization
        (lib/cc/ccsd_t.c:378), TPU-style."""
        from pyscf_mpcc_tpu.ops.triples_combine import (
            tile_energy_fused_chunk)
        prep = make_prep_fused(big, flat=flat)
        eijk, actocc3 = _fused_shared(big)
        has_act = big.get("act_occ") is not None

        def chunk_energy(tK):
            _, stacked = jax.lax.scan(lambda c, abc: (c, prep(abc)),
                                      jnp.zeros((), jnp.int32), tK)
            (w_list, vooo_t, t2p, oovv_t, t1_t, fvo_t, t1c_t, fvoc_t,
             gabc, evt) = stacked[:10]
            kw = dict(interpret=interpret, kern_precision=kprec,
                      flat=flat)
            if has_act:
                kw.update(actv=stacked[10], actocc=actocc3, act_mode=mode)
            return tile_energy_fused_chunk(
                w_list, vooo_t, t2p, oovv_t, t1_t, fvo_t, t1c_t, fvoc_t,
                eijk, gabc, evt, **kw)

        return chunk_energy

    rmode = None
    if engine == "fused":
        interp = jax.default_backend() != "tpu"

        def tile_fn(big):
            return make_tile_energy_fused(big, interpret=interp,
                                          flat=flat)
    elif engine == "resident":
        interp = jax.default_backend() != "tpu"
        if prec == jax.lax.Precision.HIGH:
            rmode = "split"
        elif prec == jax.lax.Precision.HIGHEST:
            rmode = "f32"
        else:
            gp = str(jax.config.jax_default_matmul_precision)
            rmode = ("f32" if gp in ("highest", "float32")
                     else "split" if gp in ("high", "bfloat16_3x")
                     else "bf16")

        def tile_fn(big):
            return make_tile_energy_resident(big, rmode, interpret=interp)
    else:
        tile_fn = make_tile_energy

    acc_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    if mesh is not None:
        # distribute the tile triples across the mesh: every device scans
        # its shard of the (a>=b>=c) tile space and the partial energies
        # are psum-reduced — the TPU-native counterpart of the reference's
        # MPI job slicing (lib/cc/ccsd_t.c:856 MPICCsd_t_contract).
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        ndev = mesh.devices.size
        ntrips = trips.shape[0]
        npad = (-ntrips) % ndev
        # pad the tile list to a device multiple with WEIGHT-ZERO copies of
        # tile 0: a 4th column carries the weight, the scan body multiplies
        # the tile energy by it, so pad tiles cost one tile of compute on
        # one device and contribute exactly nothing
        wcol = jnp.concatenate([jnp.ones((ntrips, 1), trips.dtype),
                                jnp.zeros((npad, 1), trips.dtype)])
        trips_p = jnp.concatenate(
            [jnp.concatenate([trips, jnp.tile(trips[:1], (npad, 1))]), wcol],
            axis=1)
        axis = mesh.axis_names[0]

        def _scan_shard(tt, big):
            body = tile_fn(big)

            def body_w(carry, twt):
                _, e = body(carry, twt[:3])
                e = e * twt[3].astype(e.dtype)
                return carry + e.astype(carry.dtype), e

            init = jax.lax.pvary(jnp.zeros((), dtype=acc_dtype), axis)
            e, _ = jax.lax.scan(body_w, init, tt)
            return jax.lax.psum(e, axis)

        # replication checking off: pallas_call outputs carry no
        # varying-mesh-axes annotation, which the checker would otherwise
        # demand (the psum at the end makes the result replicated
        # regardless).  kwarg name varies across jax versions.
        import inspect
        ck = ("check_vma" if "check_vma"
              in inspect.signature(shard_map).parameters else "check_rep")
        sharded = jax.jit(shard_map(_scan_shard, mesh=mesh,
                                    in_specs=(P(axis), P()), out_specs=P(),
                                    **{ck: False}))
        return 2.0 * float(sharded(trips_p, big_arrays))

    cache_key = (engine, flat, T, o, nvp, str(dtype), str(acc_dtype), mode,
                 act_hole is not None,
                 None if act_hole is None else (tuple(np.sort(act_hole)),
                                                tuple(np.sort(act_particle))),
                 ovvv is None,
                 None if Lov is None else Lov.shape[0],
                 jax.default_backend(),
                 # precision enters the traced dots (MXU pass count); a
                 # cache hit across a config flip would return the stale
                 # executable — BOTH the global flag and the per-call
                 # dot_precision/resident-mode are part of the key
                 str(jax.config.jax_default_matmul_precision),
                 str(prec), rmode)
    ntrips = trips.shape[0]
    total = 0.0
    if engine == "fused" and chunk > 1:
        # grid-batched path: scan over chunks of K tiles, each chunk =
        # one stacked prep scan + ONE pallas_call with grid (K, T, T)
        K = int(chunk)
        npadK = (-ntrips) % K
        tripsK = (jnp.concatenate([trips, jnp.tile(trips[:1], (npadK, 1))])
                  if npadK else trips)
        trips3 = tripsK.reshape(-1, K, 3)
        key = cache_key + ("chunkK", K)
        run = _SCAN_CACHE.get(key)
        if run is None:
            def _run(tr3, big):
                ce = make_chunk_energy_fused(big, interpret=interp,
                                             flat=flat)
                return jax.lax.scan(lambda c, tK: (c, ce(tK)),
                                    jnp.zeros((), jnp.int32), tr3)[1]
            run = jax.jit(_run)
            _SCAN_CACHE[key] = run
        mcall = max(1, tiles_per_call // K)
        M = trips3.shape[0]
        p = 0
        while p < M:
            m = min(mcall, M - p)
            ys = run(jax.lax.slice(trips3, (p, 0, 0), (p + m, K, 3)),
                     big_arrays)
            evals = np.asarray(ys, dtype=np.float64).ravel()
            nvalid = max(0, min(ntrips, (p + m) * K) - p * K)
            total += float(evals[:nvalid].sum())
            p += m
        return 2.0 * total

    scan_chunk = _SCAN_CACHE.get(cache_key)
    if scan_chunk is None:
        scan_chunk = jax.jit(
            lambda c, t, big: jax.lax.scan(tile_fn(big), c, t)[1])
        _SCAN_CACHE[cache_key] = scan_chunk
    # Full chunks share one compilation; the remainder adds at most one
    # more.  The host-side float() per chunk is a deliberate sync point:
    # without it the async stream queues every chunk into one long device
    # execution, which can trip TPU execution watchdogs.
    p = 0
    while p < ntrips:
        n = min(tiles_per_call, ntrips - p)
        ys = scan_chunk(jnp.zeros((), dtype=acc_dtype),
                        jax.lax.slice(trips, (p, 0), (p + n, 3)),
                        big_arrays)
        # per-tile energies summed in fp64 on the host: the device carry
        # would random-walk ~sqrt(ntiles)*eps_f32*|e| (~1e-6 Ha at
        # (H2O)8 scale); this keeps accumulation error at the per-tile
        # rounding level regardless of tile count
        total += float(np.sum(np.asarray(ys, dtype=np.float64)))
        p += n
    return 2.0 * total
