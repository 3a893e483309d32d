"""Pallas TPU kernel: fully-resident CCSD(T) tile engine.

Role of the reference's per-(a,b,c) dgemm loop (pyscf/lib/cc/ccsd_t.c:378
CCsd_t_contract: get_wv dgemms + add_and_permute + energy reduce), with
the W intermediates NEVER leaving the chip.

The 'fused' engine (ops/triples_combine.py) runs the six W-building MXU
dots in XLA and only the permutation epilogue in Pallas; the six dot
outputs (6 x T^3 x nocc^3 fp32 ~ 403 MB/tile at (H2O)8 shape) are
written to HBM by XLA and re-read by the kernel — the measured
~5.8 ms/tile floor of that design is exactly this stream.  Here the dots
run INSIDE the kernel: the grid is (T,) over the a-virtuals of the tile,
each grid cell batches the full (b, c) plane (dot M-sides T*nocc /
T^2*nocc — MXU-shaped), and per-tile HBM traffic drops to the ~50 MB of
t2/ov operand slices.

Memory discipline (v5e VMEM):
  * t2 pair slices for the b/c tile roles are whole-array refs with
    constant index maps (fetched once per pallas_call); the a-role slice
    and the a-sliced ov blocks ride A-indexed BlockSpecs.
  * ONE canonical accumulator accW (T,T,o,o,o) — each perm's dot output
    is canonicalized immediately (4 perms need only major shuffles; the
    occupied placement sends source occupied d to slot p[d], leaving
    perm (0,2,1) a minor (j,k) swap and perm (1,2,0) a minor rotation —
    the unavoidable lane-crossing ops, same class as the fused kernel's
    Z transposes).
  * the V-term / Z-combine / energy epilogue runs per b-row
    ((T,o,o,o) working set) to bound the minor-32 padded transients.

Precision: mode 'split' reproduces XLA HIGH (bf16x3): operands arrive as
bf16 (hi, lo) pairs split in XLA and each W dot runs as
hi.hi + hi.lo + lo.hi on the native-bf16 MXU; mode 'f32' single dots at
Mosaic HIGHEST (true fp32); mode 'bf16' single-pass hi-only (the
non-production 'default' bracket).  The small w2/V-term math runs fp32
HIGHEST always, as in the fused engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))
# ordered (x, y) role pairs consumed by the W1 dots / oovv blocks
PAIRS6 = tuple((p[0], p[1]) for p in PERMS)
# all ordered role pairs (t2p/oovv stacks are indexed in this order)
PAIRS9 = tuple((r1, r2) for r1 in range(3) for r2 in range(3) if r1 != r2)


def hilo(x):
    """bf16 (hi, lo) split such that hi + lo ~ x to ~16 mantissa bits —
    the operand decomposition of XLA's HIGH (bf16x3) matmul precision."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _mapt(v, f):
    return tuple(f(x) for x in v) if isinstance(v, tuple) else f(v)


def _dot3(lhs, rhs, mode, dtype, lc, rc):
    """dot_general contracting lhs dim ``lc`` with rhs dim ``rc`` in the
    requested precision mode.  lhs/rhs are arrays, or (hi, lo) bf16
    pairs for mode='split'.  Returns f32."""
    def d(a, b, prec):
        return jax.lax.dot_general(
            a, b, (((lc,), (rc,)), ((), ())),
            preferred_element_type=dtype, precision=prec)

    if mode == "split":
        (lh, ll), (rh, rl) = lhs, rhs
        return d(lh, rh, None) + d(lh, rl, None) + d(ll, rh, None)
    prec = jax.lax.Precision.HIGHEST if mode == "f32" else None
    return d(lhs, rhs, prec)


def _occ_slots(p):
    """occ[q] = source occupied axis name landing at canonical slot q
    (source occupied d lands at canonical slot p[d])."""
    occ = [None, None, None]
    occ[p[0]], occ[p[1]], occ[p[2]] = "i", "j", "k"
    return occ


def _w1_slab_plan(o, T, mode, f32, t2s, ovs):
    """The six W1 dots with PAIR-FUSED outputs plus their slab-store
    plans: (w_fused, acc_id, loop_axis, slab_transpose).

    Mosaic cannot regroup the fused (j',k') output minor in registers
    ("unsupported shape cast"), and stacking 32 lane extracts does not
    lower either (vpad-offset concat).  Instead the caller extracts one
    32-lane j'-slab at a time and STORES it into a scratch accumulator —
    ref stores normalize layouts by construction.  acc_id 'W' is the
    canonical frame (b,c,i,j,k); 'S' the minor-swapped frame
    (b,c,i,k,j) used whenever the loop index j' lands at canonical k
    (a minor-axis store would scatter lanes).  loop_axis is the frame
    axis indexed by j' (always 2 or 3); slab_transpose maps the slab to
    the frame order with the loop axis removed."""
    out = []
    # p=(0,1,2): ov(0,1)[A] (T_b,o_i,F) . t2[c] (T_c,F,OO)
    w = _dot3(ovs[(0, 1)], t2s[2], mode, f32, 2, 1)   # (T_b,i,T_c,OO)
    out.append((w, "W", 3, (0, 2, 1, 3)))
    # p=(0,2,1): (T_c,i,T_b,OO); j'->canonical k -> frame S axis 3
    w = _dot3(ovs[(0, 2)], t2s[1], mode, f32, 2, 1)
    out.append((w, "S", 3, (2, 0, 1, 3)))
    # p=(1,0,2): (T_b,i',T_c,OO); j'->canonical i (axis 2); (b,c,j=i',k)
    w = _dot3(ovs[(1, 0)], t2s[2], mode, f32, 2, 1)
    out.append((w, "W", 2, (0, 2, 1, 3)))
    # p=(1,2,0): (T_b,T_c,i',OO); j'->canonical k -> S axis 3;
    # (b,c,i=k',j=i')  [minor swap]
    w = _dot3(ovs[(1, 2)], t2s[0], mode, f32, 3, 0)
    out.append((w, "S", 3, (0, 1, 3, 2)))
    # p=(2,0,1): (T_c,i',T_b,OO); j'->canonical i; (b,c,j=k',k=i')
    w = _dot3(ovs[(2, 0)], t2s[1], mode, f32, 2, 1)
    out.append((w, "W", 2, (2, 0, 3, 1)))
    # p=(2,1,0): (T_c,T_b,i',OO); j'->canonical j; (b,c,i=k',k=i')
    w = _dot3(ovs[(2, 1)], t2s[0], mode, f32, 3, 0)
    out.append((w, "W", 3, (1, 0, 3, 2)))
    return out


def _unf_minor(o, w):
    """(..., fused pair) -> (..., p1, p2) via static 32-lane extracts
    (a direct minor reshape is an unsupported Mosaic shape cast)."""
    parts = [jax.lax.slice_in_dim(w, j * o, (j + 1) * o,
                                  axis=w.ndim - 1) for j in range(o)]
    return jnp.stack(parts, axis=-2)


def _w2_slab_plan(o, T, f32, kprec, voo, t2p):
    """The six W2 = vooo . t2 dots with fused (i,j) outputs plus slab
    plans (see _w1_slab_plan; here the extract loop runs over i'):
    w2[x,y,z,i,j,k] = sum_m vooo[x,(i,j),m] t2p[(z,y)][..,m,k], emitted
    t2-side-first so the fused pair is the 128-aligned output minor."""
    out = []
    for p in PERMS:
        xi, yi, zi = p
        vb = voo[xi]                       # (oo, m) or (T, oo, m)
        tm = t2p[(zi, yi)]                 # ([Tz], [Ty], m, k)
        w2 = jax.lax.dot_general(
            tm, vb, (((tm.ndim - 2,), (vb.ndim - 1,)), ((), ())),
            preferred_element_type=f32, precision=kprec)
        # fused axes: [Tz] [Ty] k' [Tx] (i,j); slab (over i'): minor j'
        if p == (0, 1, 2):     # slab (T_c,T_b,k',j'); i'->W axis2
            out.append((w2, "W", 2, (1, 0, 3, 2)))
        elif p == (0, 2, 1):   # slab (T_b,T_c,k',j'); i'->W axis2;
            out.append((w2, "W", 2, (0, 1, 2, 3)))   # (b,c,j=k',k=j')
        elif p == (1, 0, 2):   # slab (T_c,k',T_b,j'); i'->W axis3
            out.append((w2, "W", 3, (2, 0, 3, 1)))   # (b,c,i=j',k=k')
        elif p == (1, 2, 0):   # slab (T_c,k',T_b,j'); i'->W axis3
            out.append((w2, "W", 3, (2, 0, 1, 3)))   # (b,c,i=k',k=j')
        elif p == (2, 0, 1):   # slab (T_b,k',T_c,j'); i'->S axis3
            out.append((w2, "S", 3, (0, 2, 3, 1)))   # (b,c,i=j',j=k')
        else:                  # (2,1,0): slab (T_b,k',T_c,j'); i'->S ax3
            out.append((w2, "S", 3, (0, 2, 1, 3)))   # (b,c,i=k',j=j')
    return out


def _expand_to(arr, names, tgt):
    """Expand/permute ``arr`` (axes labeled ``names``) into the frame
    ``tgt``, inserting broadcast axes for missing labels."""
    cur = list(names)
    out = arr
    for n in tgt:
        if n not in cur:
            out = jnp.expand_dims(out, 0)
            cur.insert(0, n)
    return jnp.transpose(out, tuple(cur.index(n) for n in tgt))


def _v_row(o, T, f32, b, p, oov, t2p, t1r, fvor, t1c, fvoc,
           t1a, fvoa, t1ac, fvoac):
    """Row-b (over canonical t_b) V-term of one perm:
    0.5 * ((i'x|j'y) t1[k',z] + t2[(y,x)][i',j'] fvo[z,k'])
    returned in the (t_c, i, j, k) frame.

    The z-side factors arrive in BOTH orientations — rows (.., 1, o) and
    columns (.., o, 1) — because Mosaic cannot move a lane-resident
    vector into sublanes in-register (the old fused kernel's t1c/fvoc
    dual feed, same reason)."""
    xi, yi, zi = p
    ab = oov[(xi, yi)]
    tb = t2p[(yi, xi)]
    ab_names = [f"t{r}" for r in (xi, yi) if r != 0] + ["i", "j"]
    tb_names = [f"t{r}" for r in (yi, xi) if r != 0] + ["i", "j"]

    def slice_b(arr, names):
        if "t1" in names:
            i = names.index("t1")
            arr = jax.lax.index_in_dim(arr, b, axis=i, keepdims=False)
            names = names[:i] + names[i + 1:]
        return arr, names

    ab, ab_n = slice_b(ab, list(ab_names))
    tb, tb_n = slice_b(tb, list(tb_names))
    occ = _occ_slots(p)
    tgt = ["t2"] + occ                   # (t_c, i, j, k)
    a4 = _expand_to(ab, ab_n, tgt)
    c4 = _expand_to(tb, tb_n, tgt)
    kslot = 1 + p[2]                     # canonical slot of k' in tgt

    def zfac(rows, cols, arow, acol):
        if kslot == 3:                   # k' minor: row orientation
            if zi == 0:
                return arow.reshape(1, 1, 1, o)          # (1, o)
            if zi == 1:
                r = jax.lax.index_in_dim(rows[1], b, axis=0,
                                         keepdims=False)  # (1, o)
                return r.reshape(1, 1, 1, o)
            return rows[2].reshape(T, 1, 1, o)           # (T, 1, o)
        # k' in sublanes: column orientation (o, 1)
        if zi == 0:
            base = acol                                   # (o, 1)
        elif zi == 1:
            base = jax.lax.index_in_dim(cols[1], b, axis=0,
                                        keepdims=False)   # (o, 1)
        else:
            base = cols[2]                                # (T, o, 1)
        if zi == 2:
            v = base[:, :, :, None]                       # (T, o, 1, 1)
            if kslot == 2:
                v = jnp.transpose(v, (0, 2, 1, 3))        # (T, 1, o, 1)
            return v
        v = base[None, :, :, None] if kslot == 1 \
            else base[None, None, :, :]                   # o at kslot
        return v.reshape((1, o, 1, 1) if kslot == 1 else (1, 1, o, 1))

    t1z = zfac(t1r, t1c, t1a, t1ac)
    fz = zfac(fvor, fvoc, fvoa, fvoac)
    return 0.5 * (a4 * t1z + c4 * fz)


def _combine_resident(o, T, act_mode, dtype, mode, refs):
    (t2_refs, ov_refs, vooo_refs, t2p_refs, oovv_refs, t1_ref, fvo_ref,
     t1c_ref, fvoc_ref, t1a_ref, fvoa_ref, t1ac_ref, fvoac_ref,
     eijk_ref, eabc_ref, wgt_ref, actv_ref, actocc_ref, out_ref,
     gI_scr, gJ_scr, gK_scr) = refs
    A = pl.program_id(0)
    f32 = dtype
    kprec = jax.lax.Precision.HIGHEST

    def rd(r):
        return _mapt(r, lambda x: x[...]) if isinstance(r, tuple) \
            else r[...]

    t2s = [rd(t2_refs[r]) for r in range(3)]
    ovs = {PAIRS6[i]: rd(ov_refs[i]) for i in range(6)}
    voo = [rd(vooo_refs[r]) for r in range(3)]
    t2p = {PAIRS9[i]: rd(t2p_refs[i]) for i in range(len(PAIRS9))}
    oov = {PAIRS9[i]: rd(oovv_refs[i]) for i in range(len(PAIRS9))}
    t1v = t1_ref[...]          # rows (3, T, 1, o)
    fvov = fvo_ref[...]
    t1cv = t1c_ref[...]        # columns (3, T, o, 1)
    fvocv = fvoc_ref[...]
    t1a = t1a_ref[...]         # A-row (1, o)
    fvoa = fvoa_ref[...]
    t1ac = t1ac_ref[...]       # A-column (o, 1)
    fvoac = fvoac_ref[...]
    eijkv = eijk_ref[...]
    eabcv = eabc_ref[...]          # (T, T, 1) — c in sublanes
    wgtv = wgt_ref[...]
    actvv = actv_ref[...] if act_mode is not None else None
    actoccv = actocc_ref[...] if act_mode is not None else None

    # ---- W build: slab stores into three loop-leading scratch frames.
    # Strided read-modify-write stores (acc[:, :, jj] += ...) and their
    # zero inits blew up the remote Mosaic compile (SIGKILL); instead
    # each (group, jj) slot is written EXACTLY ONCE as a pure
    # leading-index store, with the group's terms summed in registers:
    #   gI (o_i, b, c, j, k)  — terms whose extract loop is canonical i
    #   gJ (o_j, b, c, i, k)  — canonical j
    #   gK (o_k, b, c, i, j)  — canonical k
    plans = [(w, acc_id, ax, tr, 1.0) for (w, acc_id, ax, tr)
             in _w1_slab_plan(o, T, mode, f32, t2s, ovs)]
    plans += [(w, acc_id, ax, tr, -1.0) for (w, acc_id, ax, tr)
              in _w2_slab_plan(o, T, f32, kprec, voo, t2p)]
    groups = {}
    for w, acc_id, ax, tr, sign in plans:
        groups.setdefault((acc_id, ax), []).append((w, tr, sign))
    scr = {("W", 2): gI_scr, ("W", 3): gJ_scr, ("S", 3): gK_scr}
    for jj in range(o):
        for key, terms in groups.items():
            tot = None
            for w, tr, sign in terms:
                slab = jax.lax.slice_in_dim(w, jj * o, (jj + 1) * o,
                                            axis=w.ndim - 1)
                slab = sign * jnp.transpose(slab, tr)
                tot = slab if tot is None else tot + slab
            scr[key][jj] = tot

    # ---- per-b-row epilogue
    eacc = jnp.zeros((o, o, o), f32)
    for b in range(T):
        Wb = (jnp.transpose(gI_scr[:, b], (1, 0, 2, 3))
              + jnp.transpose(gJ_scr[:, b], (1, 2, 0, 3))
              + jnp.transpose(gK_scr[:, b], (1, 2, 3, 0)))
        Vb = Wb
        for p in PERMS:
            Vb = Vb + _v_row(o, T, f32, b, p, oov, t2p, t1v, fvov,
                             t1cv, fvocv, t1a, fvoa, t1ac, fvoac)
        Vx = jnp.transpose(Vb, (0, 2, 3, 1))          # V[jki]
        Vy = jnp.transpose(Vb, (0, 3, 1, 2))          # V[kij]
        Zb = (4.0 * Vb + Vx + Vy
              - 2.0 * jnp.transpose(Vy, (0, 2, 1, 3))
              - 2.0 * jnp.transpose(Vx, (0, 2, 1, 3))
              - 2.0 * jnp.transpose(Vb, (0, 2, 1, 3)))
        # the (T,T,T,1) tables keep the c-axis in SUBLANES (minor is a
        # dummy 1): row b slices to (T_c, 1) and expands with 1-dims only
        # (a (T,)-lane vector cannot be cast to (T,1,1,1) on Mosaic)
        eb = jax.lax.index_in_dim(eabcv, b, axis=0,
                                  keepdims=False)[:, :, None, None]
        denom = eijkv[None] - eb
        zd = Zb / denom
        if act_mode is not None:
            ab_ = jax.lax.index_in_dim(actvv, b, axis=0,
                                       keepdims=False)[:, :, None, None]
            act6 = ab_ * actoccv[None]
            zd = zd * ((1.0 - act6) if act_mode == "exclude_active"
                       else act6)
        wb = jax.lax.index_in_dim(wgtv, b, axis=0,
                                  keepdims=False)[:, :, None, None]
        eacc = eacc + jnp.sum((Wb * zd) * wb, axis=0)

    e = jnp.sum(eacc)

    @pl.when(A == 0)
    def _():
        out_ref[0, 0] = e

    @pl.when(A != 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + e


def _kernel_entry(o, T, act_mode, dtype, mode, gabc_unused, *rest):
    del gabc_unused
    i = 0

    def take(n):
        nonlocal i
        out = rest[i:i + n]
        i += n
        return list(out)

    if mode == "split":
        t2_refs = [tuple(take(2)) for _ in range(3)]
        ov_refs = [tuple(take(2)) for _ in range(6)]
    else:
        t2_refs = [take(1)[0] for _ in range(3)]
        ov_refs = [take(1)[0] for _ in range(6)]
    vooo_refs = take(3)
    t2p_refs = take(len(PAIRS9))
    oovv_refs = take(len(PAIRS9))
    (t1_ref, fvo_ref, t1c_ref, fvoc_ref, t1a_ref, fvoa_ref, t1ac_ref,
     fvoac_ref, eijk_ref, eabc_ref, wgt_ref, actv_ref, actocc_ref,
     out_ref, gI_scr, gJ_scr, gK_scr) = take(17)
    _combine_resident(o, T, act_mode, dtype, mode,
                      (t2_refs, ov_refs, vooo_refs, t2p_refs, oovv_refs,
                       t1_ref, fvo_ref, t1c_ref, fvoc_ref, t1a_ref,
                       fvoa_ref, t1ac_ref, fvoac_ref, eijk_ref,
                       eabc_ref, wgt_ref, actv_ref, actocc_ref, out_ref,
                       gI_scr, gJ_scr, gK_scr))


def tile_energy_resident(t2sl, ovbl, vooo_t, t2p, oovv_t, t1_t, fvo_t,
                         eijk, eabc3, wgt3, act3=None, actocc=None,
                         act_mode=None, interpret=False, mode="split"):
    """Tile energy with the W dots inside the kernel.

    t2sl: 3 per-role t2 pair slices — for mode='split' a list of (hi, lo)
          bf16 pairs, shapes (T, F, OO); else f32 arrays
    ovbl: the 6 ordered-pair (ix|fy) blocks (PAIRS6 order), (T, T, o, F),
          (hi, lo) pairs for mode='split'
    vooo_t: (3, T, oo, o) [(i,j), m] blocks
    t2p/oovv_t: (len(PAIRS9), T, T, o, o) stacks in PAIRS9 order
    t1_t/fvo_t: (3, T, o) role-major rows
    eijk: (o, o, o); eabc3: (T, T, T) orbital-energy sums;
    wgt3: (T, T, T) degeneracy weights (zero on the padded/invalid
          region); act3: (T, T, T) virtual-active product, actocc:
          (o, o, o) occupied-active product.
    """
    T = vooo_t.shape[1]
    o = t2p.shape[-1]
    f32 = vooo_t.dtype

    def const(shape):
        return pl.BlockSpec(shape, lambda A: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    split = mode == "split"
    t2sl_shape = t2sl[1][0].shape if split else t2sl[1].shape
    ov_shape = ovbl[0][0].shape if split else ovbl[0].shape
    F = ov_shape[3]

    def t2spec(r):
        if r == 0:
            return pl.BlockSpec((None, F, t2sl_shape[2]),
                                lambda A: (A, 0, 0),
                                memory_space=pltpu.VMEM)
        return const(t2sl_shape)

    def ovspec(i):
        xi, yi = PAIRS6[i]
        return pl.BlockSpec(
            (None if xi == 0 else T, None if yi == 0 else T, o, F),
            lambda A, xi=xi, yi=yi: (A if xi == 0 else 0,
                                     A if yi == 0 else 0, 0, 0),
            memory_space=pltpu.VMEM)

    def voospec(r):
        return pl.BlockSpec((None, None if r == 0 else T, o * o, o),
                            lambda A, r=r: (r, A if r == 0 else 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def pairspec(idx):
        r1, r2 = PAIRS9[idx]
        return pl.BlockSpec(
            (None, None if r1 == 0 else T, None if r2 == 0 else T, o, o),
            lambda A, r1=r1, r2=r2, idx=idx: (
                idx, A if r1 == 0 else 0, A if r2 == 0 else 0, 0, 0),
            memory_space=pltpu.VMEM)

    args = []
    in_specs = []
    for r in range(3):
        parts = t2sl[r] if split else (t2sl[r],)
        for part in parts:
            args.append(part)
            in_specs.append(t2spec(r))
    for i in range(6):
        parts = ovbl[i] if split else (ovbl[i],)
        for part in parts:
            args.append(part)
            in_specs.append(ovspec(i))
    for r in range(3):
        args.append(vooo_t)
        in_specs.append(voospec(r))
    for idx in range(len(PAIRS9)):
        args.append(t2p)
        in_specs.append(pairspec(idx))
    for idx in range(len(PAIRS9)):
        args.append(oovv_t)
        in_specs.append(pairspec(idx))
    if act3 is None:
        act3 = jnp.zeros((T, T, T), f32)
        actocc = jnp.zeros((o, o, o), f32)
    # z-side factors in BOTH orientations (rows (..,1,o) / columns
    # (..,o,1)) + A-indexed role-0 variants; block last-two dims equal
    # the array dims (the Mosaic block divisibility rule), and the dual
    # feed avoids in-register lane<->sublane moves (see _v_row)
    t1row = t1_t[:, :, None, :]
    fvorow = fvo_t[:, :, None, :]
    t1col = t1_t[:, :, :, None]
    fvocol = fvo_t[:, :, :, None]
    rowa = pl.BlockSpec((None, 1, o), lambda A: (A, 0, 0),
                        memory_space=pltpu.VMEM)
    cola = pl.BlockSpec((None, o, 1), lambda A: (A, 0, 0),
                        memory_space=pltpu.VMEM)
    args += [t1row, fvorow, t1col, fvocol,
             t1_t[0][:, None, :], fvo_t[0][:, None, :],
             t1_t[0][:, :, None], fvo_t[0][:, :, None], eijk]
    in_specs += [const((3, T, 1, o)), const((3, T, 1, o)),
                 const((3, T, o, 1)), const((3, T, o, 1)),
                 rowa, rowa, cola, cola, const((o, o, o))]
    # A-indexed (T, T, 1) planes of the (T, T, T, 1) per-tile tables —
    # the trailing singleton keeps the (b, c) values in sublanes so the
    # kernel's row slices broadcast without lane->sublane casts
    plane = pl.BlockSpec((None, T, T, 1), lambda A: (A, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    args += [eabc3[..., None], wgt3[..., None], act3[..., None], actocc]
    in_specs += [plane, plane, plane, const((o, o, o))]

    kernel = partial(_kernel_entry, o, T, act_mode, f32, mode, None)
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), f32),
        scratch_shapes=[pltpu.VMEM((o, T, T, o, o), f32),
                        pltpu.VMEM((o, T, T, o, o), f32),
                        pltpu.VMEM((o, T, T, o, o), f32)],
        interpret=interpret,
        **extra,
    )(*args)
    return out[0, 0]
