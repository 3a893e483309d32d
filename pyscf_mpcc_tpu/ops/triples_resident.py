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


def _w1_terms(o, T, mode, f32, t2s, ovs):
    """The six W1 dots as (contribution, transpose_to_canonical) pairs,
    each unfused to 5D (tiles..., occ...) with a STATIC transpose into
    the canonical (t_b, t_c, i, j, k) frame.

    Reshape discipline (Mosaic-supported ops only): fusing/splitting a
    MAJOR (non-minor) dim is free; the fused (j,k) pair is split either
    as the minor axis (128-aligned minor split) or as a leading axis
    (major split).  Source occupied d lands at canonical slot p[d];
    choosing ov-side-first vs t2-side-first emission per perm leaves
    exactly TWO lane-crossing transposes (perms (0,2,1) and (1,2,0)) —
    the same op class as the fused kernel's Z transposes."""
    def unf_minor(w):
        # (..., OO) -> (..., o, o): minor split at the aligned boundary
        return w.reshape(w.shape[:-1] + (o, o))

    out = []
    # p=(0,1,2): ov(0,1)[A] (T_b,o_i,F) . t2[c] (T_c,F,OO)
    # -> (T_b,i,T_c,j,k); canonical (b,c,i,j,k)
    w = unf_minor(_dot3(ovs[(0, 1)], t2s[2], mode, f32, 2, 1))
    out.append((w, (0, 2, 1, 3, 4)))
    # p=(0,2,1): ov(0,2)[A] (T_c,o_i,F) . t2[b] -> (T_c,i,T_b,j',k');
    # canonical (b,c,i,k',j')   [minor swap — lane-crossing 1/2]
    w = unf_minor(_dot3(ovs[(0, 2)], t2s[1], mode, f32, 2, 1))
    out.append((w, (2, 0, 1, 4, 3)))
    # p=(1,0,2): ov(1,0)[:,A] (T_b,o_i',F) . t2[c] -> (T_b,i',T_c,j',k');
    # canonical (b,c,j',i',k')
    w = unf_minor(_dot3(ovs[(1, 0)], t2s[2], mode, f32, 2, 1))
    out.append((w, (0, 2, 3, 1, 4)))
    # p=(1,2,0): ov(1,2) (T_b,T_c,o_i',F) . t2[a][A] (F,OO)
    # -> (T_b,T_c,i',j',k'); canonical (b,c,k',i',j')
    # [minor rotation — lane-crossing 2/2]
    w = unf_minor(_dot3(ovs[(1, 2)], t2s[0], mode, f32, 3, 0))
    out.append((w, (0, 1, 4, 2, 3)))
    # p=(2,0,1): t2-side first keeps i' minor: t2[b] (T_b,F,OO) .
    # ov(2,0)[:,A] (T_c,o_i',F) -> (T_b, OO, T_c, i'); the fused pair is
    # now a NON-minor axis — split it as a major split — then canonical
    # (b,c,j',k',i') needs only major shuffles.
    w = _dot3(t2s[1], ovs[(2, 0)], mode, f32, 1, 2)
    w = w.reshape(T, o, o, T, o)                 # (T_b, j', k', T_c, i')
    out.append((w, (0, 3, 1, 2, 4)))
    # p=(2,1,0): t2[a][A] (F,OO) . ov(2,1) (T_c,T_b,o_i',F)
    # -> (OO, T_c, T_b, i') -> (j',k',T_c,T_b,i'); canonical
    # (b,c,k',j',i') — major shuffles only.
    w = _dot3(t2s[0], ovs[(2, 1)], mode, f32, 0, 3)
    w = w.reshape(o, o, T, T, o)
    out.append((w, (3, 2, 1, 0, 4)))
    return out


def _w2_term(o, T, f32, kprec, p, voo, t2p):
    """One perm's W2 = vooo . t2 contribution, canonicalized:
    w2[x,y,z,i,j,k] = sum_m vooo[x, (i,j), m] t2p[(z,y)][z,y,m,k]."""
    xi, yi, zi = p
    vb = voo[xi]                       # (oo, m) or (T, oo, m)
    tm = t2p[(zi, yi)]                 # ([Tz], [Ty], m, k)
    nl = vb.ndim - 1
    nr = tm.ndim - 2
    w2 = jax.lax.dot_general(vb, tm, (((nl,), (nr,)), ((), ())),
                             preferred_element_type=f32, precision=kprec)
    # axes: [Tx] (i,j) [Tz] [Ty] k — unfuse the MAJOR (i,j) pair
    lead = (T,) if xi != 0 else ()
    mid = tuple(T for r in (zi, yi) if r != 0)
    w2 = w2.reshape(lead + (o, o) + mid + (o,))
    names = ([f"t{xi}"] if xi != 0 else []) + ["i", "j"] \
        + ([f"t{zi}"] if zi != 0 else []) + ([f"t{yi}"] if yi != 0 else []) \
        + ["k"]
    occ = _occ_slots(p)
    tgt = ["t1", "t2"] + occ
    return jnp.transpose(w2, tuple(names.index(n) for n in tgt))


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


def _v_row(o, T, f32, b, p, oov, t2p, t1v, fvov, A):
    """Row-b (over canonical t_b) V-term of one perm:
    0.5 * ((i'x|j'y) t1[k',z] + t2[(y,x)][i',j'] fvo[z,k'])
    returned in the (t_c, i, j, k) frame."""
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
    # z-side factors, kept >= 2D throughout (Mosaic dislikes 1D): shape
    # into the 4D frame with the occupied axis at canonical slot p[2]
    if zi == 0:
        zi32 = jnp.zeros((), A.dtype) if hasattr(A, "dtype") \
            else jnp.int32(0)
        t1z = jax.lax.dynamic_slice(t1v, (zi32, A, zi32), (1, 1, o))
        fz = jax.lax.dynamic_slice(fvov, (zi32, A, zi32), (1, 1, o))
        t1z = t1z.reshape(1, 1, 1, o)
        fz = fz.reshape(1, 1, 1, o)
    elif zi == 1:
        t1z = jax.lax.index_in_dim(t1v[1], b, axis=0,
                                   keepdims=True).reshape(1, 1, 1, o)
        fz = jax.lax.index_in_dim(fvov[1], b, axis=0,
                                  keepdims=True).reshape(1, 1, 1, o)
    else:
        t1z = t1v[2].reshape(T, 1, 1, o)
        fz = fvov[2].reshape(T, 1, 1, o)
    kslot = 1 + p[2]                     # canonical slot of k' in tgt
    if kslot != 3:
        order = [0, 1, 2, 3]
        order.insert(kslot, order.pop(3))
        t1z = jnp.transpose(t1z, tuple(order))
        fz = jnp.transpose(fz, tuple(order))
    return 0.5 * (a4 * t1z + c4 * fz)


def _combine_resident(o, T, act_mode, dtype, mode, refs):
    (t2_refs, ov_refs, vooo_refs, t2p_refs, oovv_refs, t1_ref, fvo_ref,
     eijk_ref, eabc_ref, wgt_ref, actv_ref, actocc_ref, out_ref) = refs
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
    t1v = t1_ref[...]
    fvov = fvo_ref[...]
    eijkv = eijk_ref[...]
    eabcv = eabc_ref[...]
    wgtv = wgt_ref[...]
    actvv = actv_ref[...] if act_mode is not None else None
    actoccv = actocc_ref[...] if act_mode is not None else None

    # ---- W build: canonical accumulator (t_b, t_c, i, j, k)
    accW = None
    for w, tr in _w1_terms(o, T, mode, f32, t2s, ovs):
        c = jnp.transpose(w, tr)
        accW = c if accW is None else accW + c
    for p in PERMS:
        accW = accW - _w2_term(o, T, f32, kprec, p, voo, t2p)

    # ---- per-b-row epilogue
    eacc = jnp.zeros((o, o, o), f32)
    for b in range(T):
        Wb = accW[b]                                  # (T_c, o, o, o)
        Vb = Wb
        for p in PERMS:
            Vb = Vb + _v_row(o, T, f32, b, p, oov, t2p, t1v, fvov, A)
        Vx = jnp.transpose(Vb, (0, 2, 3, 1))          # V[jki]
        Vy = jnp.transpose(Vb, (0, 3, 1, 2))          # V[kij]
        Zb = (4.0 * Vb + Vx + Vy
              - 2.0 * jnp.transpose(Vy, (0, 2, 1, 3))
              - 2.0 * jnp.transpose(Vx, (0, 2, 1, 3))
              - 2.0 * jnp.transpose(Vb, (0, 2, 1, 3)))
        eb = jax.lax.index_in_dim(eabcv, b, axis=0, keepdims=True)  # (1,T)
        denom = eijkv[None] - eb.reshape(T, 1, 1, 1)
        zd = Zb / denom
        if act_mode is not None:
            ab_ = jax.lax.index_in_dim(actvv, b, axis=0,
                                       keepdims=True).reshape(T, 1, 1, 1)
            act6 = ab_ * actoccv[None]
            zd = zd * ((1.0 - act6) if act_mode == "exclude_active"
                       else act6)
        wb = jax.lax.index_in_dim(wgtv, b, axis=0,
                                  keepdims=True).reshape(T, 1, 1, 1)
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
    (t1_ref, fvo_ref, eijk_ref, eabc_ref, wgt_ref, actv_ref, actocc_ref,
     out_ref) = take(8)
    _combine_resident(o, T, act_mode, dtype, mode,
                      (t2_refs, ov_refs, vooo_refs, t2p_refs, oovv_refs,
                       t1_ref, fvo_ref, eijk_ref, eabc_ref, wgt_ref,
                       actv_ref, actocc_ref, out_ref))


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
    args += [t1_t, fvo_t, eijk]
    in_specs += [const((3, T, o)), const((3, T, o)), const((o, o, o))]
    # A-indexed (T, T) planes of the (T, T, T) per-tile tables
    plane = pl.BlockSpec((None, T, T), lambda A: (A, 0, 0),
                         memory_space=pltpu.VMEM)
    args += [eabc3, wgt3, act3, actocc]
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
        interpret=interpret,
        **extra,
    )(*args)
    return out[0, 0]
