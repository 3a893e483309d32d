"""Host-streamed DF particle-particle ladder (single-chip out-of-core).

The pp ladder's 3-center factor Lvv (naux, nvir, nvir) is the largest
persistent tensor of a DF-CCSD solve — at the reference's envelope
("CCSD ~100 occ/1500 vir", FEATURES:74) it alone is ~3x one chip's HBM.
The reference solves this with HDF5 out-of-core tensors + async
prefetch (pyscf/cc/ccsd.py:1611, dfccsd.py:54); multi-chip sharding is
this framework's first answer, but a ONE-chip machine needs the same
capability.  Here Lvv stays in host RAM (lib/hoststore) and the tiled
pair ladder of cc.rccsd.pair_ladder_sym pulls dressed row tiles on
demand through jax.experimental.io_callback, inside jit.

AD: io_callback is opaque to AD, so the op carries a hand-derived
custom_vjp.  With g the output cotangent and s(x) the joint
(ij)<->(ab)-swap symmetrization:

  out(tau, t1)          = L[Ld(t1)] s(tau),   Ld = Lvv - t1^T Lov
  d tau                 = L^T[Ld] s(g) = L[Ld^T] s(g)
                          (the swap-antisymmetric part of g provably
                          contributes zero through the final
                          symmetrization — see the derivation note)
  d t1[k,x]             = -sum_{L,y} dLd[L,x,y] Lov[L,k,y],
  dLd[L,x,y]            = 2 sum_{b,d} Ld[L,b,d] *
                          sum_ij s(g)[ij,x,b] s(tau)[ij,y,d]

Derivation note (antisymmetric part): write g = gs + ga with
ga[ijab] = -ga[jiba].  For dtau, (L^T ga)[jidc] = -(L^T ga)[ijcd], so
the final symmetrization annihilates it; for dLd the two slot
contributions cancel pairwise under the same relabeling.  Both
cotangent formulas therefore only see s(g), which keeps the A >= B
mirrored tile structure valid in the backward pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.lib import hoststore

_FACTORY_CACHE = {}


def _sym(x):
    return 0.5 * (x + x.transpose(1, 0, 3, 2))


def make_streamed_ladder(nocc, nvir, naux, ntile, dtype,
                         ntile_bwd_t1=None):
    """A custom-vjp ladder  (tau, t1, Lov, handle) -> out[ij,ab]  with the
    Lvv factor fetched tile-wise from lib.hoststore entry ``handle``.

    ntile: streaming tile count over each virtual axis (also the compute
    tiling, as in rccsd.pair_ladder_sym).  ntile_bwd_t1: finer tiling
    for the dt1 pass, whose per-pair gW block is (tsz, nvp, tsz, nvp)
    (defaults to whatever keeps that block under ~128 MB)."""
    key = (nocc, nvir, naux, ntile, str(dtype), ntile_bwd_t1)
    if key in _FACTORY_CACHE:
        return _FACTORY_CACHE[key]

    ntile = max(1, min(int(ntile), nvir))
    tsz = -(-nvir // ntile)
    nvp = ntile * tsz
    if ntile_bwd_t1 is None:
        lim = 128 * 2**20 // (4 * nvp * nvp)     # tszb^2 <= lim
        tszb = max(1, min(tsz, int(np.sqrt(max(1, lim)))))
    else:
        tszb = -(-nvir // int(ntile_bwd_t1))
    ntb = -(-nvp // tszb)
    nvpb = ntb * tszb
    pairs = np.asarray([(a, b) for a in range(ntile)
                        for b in range(a + 1)], dtype=np.int32)
    shp_rows = jax.ShapeDtypeStruct((naux, tsz, nvir), dtype)
    shp_cols = jax.ShapeDtypeStruct((naux, nvir, tsz), dtype)

    def _pad_amp(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, nvp - nvir),
                           (0, nvp - nvir))) if nvp > nvir else x

    def _dress_row_tile(handle, start, t1p, Lovp):
        """Dressed row tile Ld[L, a in tile, c] (naux, tsz, nvp)."""
        lvv = jax.experimental.io_callback(
            hoststore.fetch_rows, shp_rows, handle, start, tsz,
            ordered=False)
        if nvp > nvir:
            lvv = jnp.pad(lvv, ((0, 0), (0, 0), (0, nvp - nvir)))
        t1t = jax.lax.dynamic_slice(t1p, (jnp.int32(0), start),
                                    (nocc, tsz))
        return lvv - jnp.einsum("ka,Lkc->Lac", t1t, Lovp)

    def _dress_col_tile_T(handle, start, t1p, Lovp):
        """TRANSPOSED dressed column tile M[L, c in tile, a] =
        Ld[L, a, c in tile]  (naux, tsz, nvp)."""
        lvv = jax.experimental.io_callback(
            hoststore.fetch_cols, shp_cols, handle, start, tsz,
            ordered=False)
        if nvp > nvir:
            lvv = jnp.pad(lvv, ((0, 0), (0, nvp - nvir), (0, 0)))
        lovc = jax.lax.dynamic_slice(
            Lovp, (jnp.int32(0), jnp.int32(0), start), (naux, nocc, tsz))
        ld = lvv - jnp.einsum("ka,Lkc->Lac", t1p, lovc)
        return ld.transpose(0, 2, 1)

    def _ladder_loop(tile_fn, x_sym, handle, t1p, Lovp):
        """Mirrored A >= B pair sweep with tiles from tile_fn."""
        def body(out, ab):
            sa = ab[0] * jnp.int32(tsz)
            sb = ab[1] * jnp.int32(tsz)
            la = tile_fn(handle, sa, t1p, Lovp)
            lb = tile_fn(handle, sb, t1p, Lovp)
            w = jnp.einsum("Lac,Lbd->acbd", la, lb,
                           preferred_element_type=dtype)
            blk = jnp.einsum("acbd,ijcd->ijab", w, x_sym,
                             preferred_element_type=dtype)
            z = jnp.int32(0)
            oa = ab[0] * tsz
            ob = ab[1] * tsz
            out = jax.lax.dynamic_update_slice(
                out, blk.transpose(1, 0, 3, 2), (z, z, ob, oa))
            out = jax.lax.dynamic_update_slice(out, blk, (z, z, oa, ob))
            return out, None

        out0 = jnp.zeros((nocc, nocc, nvp, nvp), dtype)
        out, _ = jax.lax.scan(body, out0, jnp.asarray(pairs))
        return out[:, :, :nvir, :nvir]

    def _fwd_impl(tau, t1, Lov, handle):
        t1p = jnp.pad(t1, ((0, 0), (0, nvp - nvir))) if nvp > nvir else t1
        Lovp = (jnp.pad(Lov, ((0, 0), (0, 0), (0, nvp - nvir)))
                if nvp > nvir else Lov)
        tau_sym = _pad_amp(_sym(tau))
        return _ladder_loop(_dress_row_tile, tau_sym, handle, t1p, Lovp)

    @jax.custom_vjp
    def ladder(tau, t1, Lov, handle):
        return _fwd_impl(tau, t1, Lov, handle)

    def fwd(tau, t1, Lov, handle):
        return _fwd_impl(tau, t1, Lov, handle), (tau, t1, Lov, handle)

    def bwd(res, g):
        tau, t1, Lov, handle = res
        t1p = jnp.pad(t1, ((0, 0), (0, nvp - nvir))) if nvp > nvir else t1
        Lovp = (jnp.pad(Lov, ((0, 0), (0, 0), (0, nvp - nvir)))
                if nvp > nvir else Lov)
        gs = _pad_amp(_sym(g))
        taus = _pad_amp(_sym(tau))

        # --- dtau: transposed-factor ladder on s(g) ---------------------
        # symmetric already in exact arithmetic; _sym pins it under fp
        dtau = _sym(_ladder_loop(_dress_col_tile_T, gs, handle, t1p, Lovp))

        # --- dt1 through the dressing ----------------------------------
        # dLd[L,x,y] = 2 sum_bd Ld[Lbd] gW[x,y,b,d];  finer (tszb) tiles
        # bound the gW block.  dt1[k,x] = -sum_Ly dLd[L,x,y] Lov[L,k,y].
        gsb = jnp.pad(gs, ((0, 0), (0, 0), (0, nvpb - nvp),
                           (0, nvpb - nvp))) if nvpb > nvp else gs
        tausb = jnp.pad(taus, ((0, 0), (0, 0), (0, nvpb - nvp),
                               (0, nvpb - nvp))) if nvpb > nvp else taus

        def dress_row_b(start):
            """Dressed row tile at the BWD tiling (naux, tszb, nvp)."""
            lvv = jax.experimental.io_callback(
                hoststore.fetch_rows,
                jax.ShapeDtypeStruct((naux, tszb, nvir), dtype),
                handle, start, tszb, ordered=False)
            if nvp > nvir:
                lvv = jnp.pad(lvv, ((0, 0), (0, 0), (0, nvp - nvir)))
            t1t = jax.lax.dynamic_slice(
                jnp.pad(t1p, ((0, 0), (0, nvpb - nvp)))
                if nvpb > nvp else t1p,
                (jnp.int32(0), start), (nocc, tszb))
            return lvv - jnp.einsum("ka,Lkc->Lac", t1t, Lovp)

        def body_A(dt1, ia):
            sa = ia * jnp.int32(tszb)

            def body_B(dldA, ib):
                sb = ib * jnp.int32(tszb)
                ldb = dress_row_b(sb)          # (naux, tszb, nvp)
                gab = jax.lax.dynamic_slice(
                    gsb, (jnp.int32(0), jnp.int32(0), sa, sb),
                    (nocc, nocc, tszb, tszb))
                gw = jnp.einsum("ijab,ijcd->acbd", gab, taus,
                                preferred_element_type=dtype)
                dldA = dldA + 2.0 * jnp.einsum(
                    "acbd,Lbd->Lac", gw, ldb,
                    preferred_element_type=dtype)
                return dldA, None

            dldA0 = jnp.zeros((naux, tszb, nvp), dtype)
            dldA, _ = jax.lax.scan(body_B, dldA0,
                                   jnp.arange(ntb, dtype=jnp.int32))
            inc = -jnp.einsum("Lac,Lkc->ka", dldA, Lovp,
                              preferred_element_type=dtype)
            cur = jax.lax.dynamic_slice(dt1, (jnp.int32(0), sa),
                                        (nocc, tszb))
            dt1 = jax.lax.dynamic_update_slice(dt1, cur + inc,
                                               (jnp.int32(0), sa))
            return dt1, None

        dt10 = jnp.zeros((nocc, nvpb), dtype)
        dt1p, _ = jax.lax.scan(body_A, dt10,
                               jnp.arange(ntb, dtype=jnp.int32))
        dt1 = dt1p[:, :nvir]
        dLov = jnp.zeros_like(Lov)
        dhandle = np.zeros(jnp.shape(handle), jax.dtypes.float0)
        return dtau, dt1, dLov, dhandle

    ladder.defvjp(fwd, bwd)
    _FACTORY_CACHE[key] = ladder
    return ladder


# ---------------------------------------------------------------------------
# const-fetch + streamed ovvv-class contractions
# ---------------------------------------------------------------------------
#
# The pp ladder above carries a hand-derived vjp because its backward is
# itself ladder-shaped.  Every OTHER Lvv consumer in the CCSD/Lambda
# residual (cc/rccsd._OvvvOps) is a single linear pass over Lvv rows, so
# ordinary jax AD handles it — provided (a) the io_callback fetch is
# wrapped in a custom_vjp that declares the host tensor a CONSTANT of
# the differentiation (io_callback itself refuses AD), and (b) each
# per-tile body is jax.checkpoint'd so the backward pass REFETCHES tiles
# instead of keeping every fetched tile alive as an AD residual (which
# would silently re-materialize all of Lvv in HBM).


def make_fetch_rows(naux, nvir, tsz, dtype):
    """A differentiation-constant row-tile fetch: (handle, start) ->
    (naux, tsz, nvir) rows [start, start+tsz) of hoststore entry
    ``handle`` (zero-padded past the edge)."""
    shp = jax.ShapeDtypeStruct((naux, tsz, nvir), dtype)

    @jax.custom_vjp
    def fetch(handle, start):
        # pure_callback, NOT io_callback: the per-tile bodies are
        # jax.checkpoint'd and remat refuses IOEffects; the fetch is
        # deterministic, so replaying/eliding it is value-safe
        return jax.pure_callback(
            lambda h, s: hoststore.fetch_rows(h, s, tsz), shp,
            handle, start)

    def fwd(handle, start):
        return fetch(handle, start), None

    def bwd(_, g):
        z = np.zeros((), jax.dtypes.float0)
        return (z, z)

    fetch.defvjp(fwd, bwd)
    return fetch


class StreamedOvvv:
    """Streamed twins of cc/rccsd._OvvvOps' DF-mode methods, with the
    Lvv factor fetched tile-wise from lib.hoststore.

    Every method is a jax.lax.map over row tiles whose body is
    jax.checkpoint'd (see module note).  Outputs are stacked per tile
    (disjoint row slices -> reshape; the single row-REDUCTION op sums
    its stacked partials), never carried, so scan-carry AD residuals
    cannot blow up either."""

    def __init__(self, handle, Lov, nvir, ntile, dtype):
        self.handle = handle
        self.Lov = Lov
        naux, nocc = Lov.shape[0], Lov.shape[1]
        self.naux, self.nocc, self.nvir = naux, nocc, nvir
        ntile = max(1, min(int(ntile), nvir))
        self.tsz = -(-nvir // ntile)
        self.ntile = -(-nvir // self.tsz)
        self.nvp = self.ntile * self.tsz
        self.fetch = make_fetch_rows(naux, nvir, self.tsz, dtype)
        self.starts = jnp.arange(self.ntile, dtype=jnp.int32) * self.tsz

    def _map(self, body):
        return jax.lax.map(jax.checkpoint(body), self.starts)

    def t1_t2_terms(self, t2):
        """2*(kd|ac) t2[ikcd] - (kc|ad) t2[ikcd] -> [ia]"""
        x = jnp.einsum("Lkd,ikcd->Lic", self.Lov, t2)
        y = jnp.einsum("Lkc,ikcd->Lid", self.Lov, t2)

        def body(s):
            lvv = self.fetch(self.handle, s)      # (L, a-tile, c)
            return (2.0 * jnp.einsum("Lic,Lac->ia", x, lvv)
                    - jnp.einsum("Lid,Lad->ia", y, lvv))

        out = self._map(body)                     # (ntile, nocc, tsz)
        out = out.transpose(1, 0, 2).reshape(self.nocc, self.nvp)
        return out[:, :self.nvir]

    def lvv_t1(self, t1):
        """2*(kd|ac) t1[kd] - (kc|ad) t1[kd] -> [ac]"""
        z = jnp.einsum("Lkd,kd->L", self.Lov, t1)
        x = jnp.einsum("Lkc,kd->Lcd", self.Lov, t1)

        def body(s):
            lvv = self.fetch(self.handle, s)
            return (2.0 * jnp.einsum("L,Lac->ac", z, lvv)
                    - jnp.einsum("Lcd,Lad->ac", x, lvv))

        out = self._map(body)                     # (ntile, tsz, nvir)
        return out.reshape(self.nvp, self.nvir)[:self.nvir]

    def wvoov_t1(self, t1):
        """(kc|ad) t1[id] -> [akic]"""
        def body(s):
            lvv = self.fetch(self.handle, s)
            xt = jnp.einsum("Lad,id->Lai", lvv, t1)
            return jnp.einsum("Lai,Lkc->akic", xt, self.Lov)

        out = self._map(body)           # (ntile, tsz, nocc, nocc, nvir)
        nh = (self.nvp, self.nocc, self.nocc, self.nvir)
        return out.reshape(nh)[:self.nvir]

    def wvovo_t1(self, t1):
        """(kd|ac) t1[id] -> [akci]"""
        x = jnp.einsum("Lkd,id->Lki", self.Lov, t1)

        def body(s):
            lvv = self.fetch(self.handle, s)
            return jnp.einsum("Lki,Lac->akci", x, lvv)

        out = self._map(body)           # (ntile, tsz, nocc, nvir, nocc)
        nh = (self.nvp, self.nocc, self.nvir, self.nocc)
        return out.reshape(nh)[:self.nvir]

    def t2_vvov_t1(self, t1):
        """sum_c (ia|cb) t1[jc] -> [ijab]; the one row-REDUCTION op:
        the Lvv row axis is contracted, so per-tile partials are summed."""
        pad = self.nvp - self.nvir
        t1p = jnp.pad(t1, ((0, 0), (0, pad))) if pad else t1

        def body(s):
            lvv = self.fetch(self.handle, s)      # rows c in tile
            t1t = jax.lax.dynamic_slice(
                t1p, (jnp.int32(0), s), (t1.shape[0], self.tsz))
            return jnp.einsum("Lcb,jc->Ljb", lvv, t1t)

        x = jnp.sum(self._map(body), axis=0)      # (L, j, b)
        return jnp.einsum("Lia,Ljb->ijab", self.Lov, x)
