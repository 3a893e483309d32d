"""Pallas TPU kernel: CCSD(T) per-tile permutation epilogue.

Role of the reference's add_and_permute + energy reduction
(/root/reference/pyscf/lib/cc/ccsd_t.c:39-230), re-designed for the TPU
memory hierarchy.  The expensive parts of a (T) tile are

    (a) six MXU contractions  w1_p = sum_f (ix|fy) t2[k,j,z,f]   (XLA dots)
    (b) the joint-permutation assembly  W = sum_p P_p (w1_p - w2_p),
        V = W + sum_p P_p v_p, the occupied-index combine
        Z = 4V + V(jki) + V(kij) - 2V(kji) - 2V(ikj) - 2V(jik),
        and the energy reduction  e = sum W * Z / D * weight.

Step (b) is pure data movement: done in XLA it transposes two
(T,T,T,o,o,o) accumulators six times each through HBM — the measured
3 TFLOP/s bottleneck of round 1.  This kernel fuses all of (b), and the
*occupied-level* permutations are eliminated at the source: with two
stored t2 pair layouts ((j,k) and (k,j) fused) and a choice of
dot_general operand order, every one of the six permuted dot outputs
lands with its occupied axes already in canonical (i,j,k) order up to at
most a swap of the two NON-minor dims (a cheap sublane shuffle — no lane
crossing).  Derivation: perm p=(xi,yi,zi) places the ov-side occupied
index i' at canonical slot p[0]; the t2-side fused pair fills the other
two slots in either stored order, so

    p[0]=0 -> direct            (pair layout picks slots 1,2)
    p[0]=1 -> swap of dims 0,1  (minor dim untouched)
    p[0]=2 -> i' must be minor: emit the dot t2-side-first
              ((z,(jk),x,y,i)) and do ONE minor-preserving XLA
              transpose to (z,x,y,(jk),i) before the kernel.

The *tile-level* permutation is free — it is just the BlockSpec index
map.  W and V never exist in HBM.

Mosaic layout rules respected here: the only in-kernel permutations are
(1,0,2) swaps of non-minor dims; the only reshape is the supported
major-dim split (o*o, o) -> (o, o, o) on the w2 matmul output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the six joint (abc)/(ijk) permutations, as (x, y, z) role assignments
PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))
# ordered role pairs, for the t2/oovv block refs
PAIRS = tuple((r1, r2) for r1 in range(3) for r2 in range(3) if r1 != r2)

# per-perm W-dot emission plan: which t2 pair layout ('jk' fused as
# (j,k), 'kj' as (k,j)), dot operand order, and whether the kernel must
# swap the two non-minor occupied dims of the block
W_PLAN = {
    (0, 1, 2): dict(t2="jk", order="ov_first", swap=False),
    (0, 2, 1): dict(t2="kj", order="ov_first", swap=False),
    (1, 0, 2): dict(t2="jk", order="ov_first", swap=True),
    (1, 2, 0): dict(t2="kj", order="ov_first", swap=True),
    (2, 0, 1): dict(t2="jk", order="t2_first", swap=False),
    (2, 1, 0): dict(t2="kj", order="t2_first", swap=False),
}


def _w_cell(p, blk, c):
    """Canonical (o,o,o) block of column cell ``c`` from a W column value
    (the role-2 tile dim is fetched whole; see _wspec)."""
    xi, yi, zi = p
    if W_PLAN[p]["order"] == "ov_first":
        # column dims: [T (role-2 among x/y)] i [T (z if role-2)] P1 P2
        out = blk[c] if (xi == 2 or yi == 2) else blk[:, c]
        return (jnp.transpose(out, (1, 0, 2))
                if W_PLAN[p]["swap"] else out)
    return blk[c]                       # t2_first: (T, P1, P2, i)


def _debug_skip():
    """Timing-diagnostic only: TRIPLES_DEBUG_SKIP=w2,vterm,zperm,w1read
    disables kernel sections so their cost can be measured additively.
    Results are WRONG with any token set; never set in production."""
    import os
    v = os.environ.get("TRIPLES_DEBUG_SKIP", "")
    return frozenset(t for t in v.split(",") if t)


def _combine_kernel(o, T, act_mode, dtype, kprec, refs):
    """Column kernel: one invocation per (A, B) pair processes all T
    C-cells (amortizes per-grid-cell dispatch, measured 2.3x on v5e vs
    the cell-grid variant at (H2O)8 scale)."""
    skip = _debug_skip()
    (gabc_ref, evt_ref, actv_ref, w_refs, vooo_refs, t2p_refs, oovv_refs,
     t1_refs, fvo_refs, t1c_refs, fvoc_refs, eijk_ref, actocc_ref,
     out_ref) = refs
    A = pl.program_id(0)
    B = pl.program_id(1)
    # VECTOR energy accumulator: per-cell scalar jnp.sum reductions
    # serialize on the VPU (measured ~2.7 ms/tile for the 512 of them at
    # bench shape); accumulate the weighted integrand in 3D and reduce
    # ONCE per invocation instead
    eacc = jnp.zeros((o, o, o), dtype)
    # one VMEM read per ref per invocation; cells slice the values
    wv = [w_refs[pi][...] for pi in range(6)]
    t2pv = [t2p_refs[k][...] for k in range(6)]
    oovvv = [oovv_refs[k][...] for k in range(6)]
    voov = [vooo_refs[r][...] for r in range(3)]
    t1v = [t1_refs[r][...] for r in range(3)]
    fvov = [fvo_refs[r][...] for r in range(3)]
    t1cv = [t1c_refs[r][...] for r in range(3)]
    fvocv = [fvoc_refs[r][...] for r in range(3)]
    eijkv = eijk_ref[...]
    actoccv = actocc_ref[...] if act_mode is not None else None

    def pair_cell(vals, r1, r2, c):
        # (o, o) when neither role is 2, else (T, o, o) with the single
        # surviving tile dim leading (block squeeze preserves order)
        blk = vals[PAIRS.index((r1, r2))]
        return blk[c] if (r1 == 2 or r2 == 2) else blk

    def occ_cell(vals, r, c):
        return vals[r][c] if r == 2 else vals[r]

    for c in range(T):
        # ---- W1: canonical up to a non-minor (1,0,2) swap
        accW = jnp.zeros((o, o, o), dtype)
        for pi, p in enumerate(PERMS):
            accW = accW + _w_cell(p, wv[pi], c)
            if "w1read" in skip:
                break
        # ---- W2 (vooo . t2) and the V term in canonical orientation
        accV = jnp.zeros((o, o, o), dtype)
        for pi, p in enumerate(PERMS):
            if "w2" in skip and "vterm" in skip:
                break
            xi, yi, zi = p
            inv = (p.index(0), p.index(1), p.index(2))
            if "w2" not in skip:
                t2mk = pair_cell(t2pv, zi, yi, c)
                vb = voov[xi][c] if xi == 2 else voov[xi]
                w2b = jax.lax.dot_general(
                    vb, t2mk, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                    precision=kprec).reshape(o, o, o)
                accW = accW - jnp.transpose(w2b, inv)
            if "vterm" in skip:
                continue
            # v = ((i'x|j'y) t1[k',z] + t2[j',i'|y,x] fvo[z,k'])/2 placed
            # on canonical axes: source occupied d lands at inv.index(d)
            oovv_ij = pair_cell(oovvv, xi, yi, c)
            t2ij = pair_cell(t2pv, yi, xi, c)
            pos = (inv.index(0), inv.index(1), inv.index(2))
            if pos[0] < pos[1]:
                a = jnp.expand_dims(oovv_ij, axis=pos[2])
                cc = jnp.expand_dims(t2ij, axis=pos[2])
            else:
                a = jnp.expand_dims(oovv_ij.T, axis=pos[2])
                cc = jnp.expand_dims(t2ij.T, axis=pos[2])
            # k' factor broadcast along pos[2], fetched in the
            # orientation that avoids a cross-lane relayout
            if pos[2] == 2:
                b = occ_cell(t1v, zi, c)[0, :][None, None, :]
                d = occ_cell(fvov, zi, c)[0, :][None, None, :]
            elif pos[2] == 1:
                b = jnp.expand_dims(occ_cell(t1cv, zi, c)[:, :], 0)
                d = jnp.expand_dims(occ_cell(fvocv, zi, c)[:, :], 0)
            else:
                b = jnp.expand_dims(occ_cell(t1cv, zi, c)[:, :], 2)
                d = jnp.expand_dims(occ_cell(fvocv, zi, c)[:, :], 2)
            accV = accV + 0.5 * (a * b + cc * d)

        V = accV + accW
        eabc = evt_ref[0, A] + evt_ref[1, B] + evt_ref[2, c]
        ga = gabc_ref[0, A]
        gb = gabc_ref[1, B]
        gc = gabc_ref[2, c]
        wgt = jnp.where((ga > gb) & (gb > gc), 1.0,
                        jnp.where((ga == gb) & (gb == gc), 1.0 / 6.0,
                                  jnp.where((ga >= gb) & (gb >= gc),
                                            0.5, 0.0)))
        if act_mode is not None:
            af = actv_ref[0, A] * actv_ref[1, B] * actv_ref[2, c]
            act6 = af * actoccv
            mask = (1.0 - act6) if act_mode == "exclude_active" else act6
        # Of the five permutations of V, only TWO need a lane-crossing
        # relayout: V^(2,1,0) and V^(0,2,1) are (1,0,2)-children of
        # V^(2,0,1) and V^(1,2,0) (swap of the two NON-minor dims — a
        # cheap sublane shuffle).  Bit-exact: same element values, same
        # summation order as the naive six-transpose form.
        if "zperm" in skip:
            Z = 4.0 * V
        elif "zlane" in skip:
            # timing probe: lane-crossing transposes replaced by the cheap
            # non-minor swap (wrong values, isolates the relayout cost)
            Vx = jnp.transpose(V, (1, 0, 2))
            Vy = jnp.transpose(V, (1, 0, 2))
            Z = (4.0 * V + Vx + Vy
                 - 2.0 * jnp.transpose(Vy, (1, 0, 2))
                 - 2.0 * jnp.transpose(Vx, (1, 0, 2))
                 - 2.0 * jnp.transpose(V, (1, 0, 2)))
        else:
            Vx = jnp.transpose(V, (1, 2, 0))    # V[j,k,i]  (lane-crossing)
            Vy = jnp.transpose(V, (2, 0, 1))    # V[k,i,j]  (lane-crossing)
            Z = (4.0 * V
                 + Vx
                 + Vy
                 - 2.0 * jnp.transpose(Vy, (1, 0, 2))   # = V^(2,1,0)
                 - 2.0 * jnp.transpose(Vx, (1, 0, 2))   # = V^(0,2,1)
                 - 2.0 * jnp.transpose(V, (1, 0, 2)))
        zd = Z / (eijkv - eabc)
        if act_mode is not None:
            zd = zd * mask
        eacc = eacc + (accW * zd) * wgt.astype(dtype)

    etot = jnp.sum(eacc)
    first = (A == 0) & (B == 0)

    @pl.when(first)
    def _():
        out_ref[0, 0] = etot

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0, 0] = out_ref[0, 0] + etot


def _kernel_entry(o, T, act_mode, dtype, kprec, gabc, evt, actv, *rest):
    w = rest[0:6]
    vooo = rest[6:9]
    t2p = rest[9:15]
    oovv = rest[15:21]
    t1 = rest[21:24]
    fvo = rest[24:27]
    t1c = rest[27:30]
    fvoc = rest[30:33]
    eijk, actocc, out = rest[33], rest[34], rest[35]
    _combine_kernel(o, T, act_mode, dtype, kprec,
                    (gabc, evt, actv, w, vooo, t2p, oovv, t1, fvo, t1c,
                     fvoc, eijk, actocc, out))


# ---------------------------------------------------------------------------
# v2 epilogue: hoist the 6-way W1 sum and the V term to XLA, slim the kernel
# ---------------------------------------------------------------------------
#
# Because canonical emission already places every occupied axis of the six
# emit_w_dot outputs in canonical order up to NON-minor moves, the transpose
# from each emit layout to the canonical (ta, tb, tc, i, j, k) tile array
# never touches the minor axis — it is a cheap relayout XLA fuses into the
# 6-way add.  The kernel then reads ONE Wsum array (67 MB/tile at bench
# shape) instead of six, and the V term (pure broadcasts) is likewise
# assembled in one fused XLA write.  Measured on v5e at (H2O)8 shape this
# halves the per-tile epilogue time (see bench.py triples detail).
#
# Canonical axes per perm, derived from the emit layouts:
#   ov_first  arrays are (x, y, i', z, P1, P2); t2_first are
#   (z, x, y, P1, P2, i'); pair (P1, P2) = (j', k') for layout 'jk' and
#   (k', j') for 'kj'.  Canonical slot q takes tile role inv[q] and
#   occupied role inv[q] (inv = p.index(0..2)).  Axis 5 is preserved in
#   every case.
W1_CANON = {
    (0, 1, 2): (0, 1, 3, 2, 4, 5),
    (0, 2, 1): (0, 3, 1, 2, 4, 5),
    (1, 0, 2): (1, 0, 3, 4, 2, 5),
    (1, 2, 0): (3, 0, 1, 4, 2, 5),
    (2, 0, 1): (2, 0, 1, 3, 4, 5),
    (2, 1, 0): (0, 2, 1, 3, 4, 5),
}

# w2[x,y,z,i,j,k] = sum_m vooo[x, i, (j,m)] t2[k, m, z, y] inside the
# kernel: the dot contracts fused-pair vooo rows ((P1,P2), m) against the
# t2 cell (m, k), giving (P1, P2, k') after the supported MAJOR-dim
# split.  (Emitting k' leading would need a minor-dim split, which Mosaic
# rejects.)  Choosing the pair layout ('ij' or 'ji') leaves two perms
# fully canonical; the other four need the listed in-kernel transpose of
# the (o,o,o) cell — same cost class as the v1 kernel's inv-transposes.
W2_PLAN = {
    (0, 1, 2): dict(pair="ij", post=None),
    (1, 0, 2): dict(pair="ji", post=None),
    (0, 2, 1): dict(pair="ij", post=(0, 2, 1)),
    (1, 2, 0): dict(pair="ij", post=(2, 0, 1)),
    (2, 0, 1): dict(pair="ji", post=(0, 2, 1)),
    (2, 1, 0): dict(pair="ji", post=(2, 0, 1)),
}


# Perms whose canonicalizing transpose keeps the last TWO emit axes
# adjacent and in order: their transpose runs on the pair-fused 5D view
# (minor dim o*o >= 128 -> full lane width).  Measured on v5e this is the
# difference between ~0.9 ms and ~0.15 ms per 67 MB array: a trailing
# (o, o) block uses 32 of 128 lanes, the fused (o*o,) minor uses all.
W1_FUSED4 = {
    (0, 1, 2): (0, 1, 3, 2, 4),
    (0, 2, 1): (0, 3, 1, 2, 4),
    (2, 0, 1): (2, 0, 1, 3, 4),
    (2, 1, 0): (0, 2, 1, 3, 4),
}
# the two p[0] == 1 perms place the ov-side occupied index BETWEEN the
# pair elements — no fused-view transpose exists; they go to the kernel
# in raw emit layout (v1-style BlockSpec + per-cell slice/swap)
W1_RAW2 = ((1, 0, 2), (1, 2, 0))


def canonical_w1_sum4(w_list, T, o):
    """Canonical (ta,tb,tc,i,j,k) sum of the four fusable emit_w_dot
    outputs, computed at full lane width on the pair-fused 5D views."""
    acc = None
    for p, w in zip(PERMS, w_list):
        ax5 = W1_FUSED4.get(p)
        if ax5 is None:
            continue
        w5 = w.reshape(w.shape[:4] + (w.shape[4] * w.shape[5],))
        wt = jnp.transpose(w5, ax5)
        acc = wt if acc is None else acc + wt
    return acc.reshape(T, T, T, o, o, o)


def _combine_kernel_v2(o, T, act_mode, dtype, kprec, refs):
    (gabc_ref, evt_ref, actv_ref, wsum_ref, vterm_ref, wraw_refs,
     va_ij0_ref, va_ij1_ref, va_ji1_ref, va_ji2_ref,
     t2p_refs, eijk_ref, actocc_ref, out_ref) = refs
    A = pl.program_id(0)
    B = pl.program_id(1)
    eacc = jnp.zeros((o, o, o), dtype)   # vector energy accumulator
    wsum = wsum_ref[...]
    vterm = vterm_ref[...]
    wraw = [r[...] for r in wraw_refs]   # the two p[0]==1 emit arrays
    va_ij0 = va_ij0_ref[...]      # (oo, o)  role-0 (grid A)
    va_ij1 = va_ij1_ref[...]      # (oo, o)  role-1 (grid B)
    va_ji1 = va_ji1_ref[...]      # (oo, o)  role-1
    va_ji2 = va_ji2_ref[...]      # (T, oo, o)  role-2 column
    t2pv = {k: r[...] for k, r in t2p_refs.items()}
    eijkv = eijk_ref[...]
    actoccv = actocc_ref[...] if act_mode is not None else None

    def cell(val, zi, yi, c):
        # pair block value -> (o, o) matrix of cell c (role-2 dim leads)
        return val[c] if (zi == 2 or yi == 2) else val

    for c in range(T):
        accW = wsum[c]
        for p, wv in zip(W1_RAW2, wraw):
            accW = accW + _w_cell(p, wv, c)
        # ---- subtract the six w2 dots (canonical up to W2_PLAN['post'])
        for p in PERMS:
            xi, yi, zi = p
            plan = W2_PLAN[p]
            if plan["pair"] == "ij":
                va = va_ij0 if xi == 0 else va_ij1
            else:
                va = va_ji2[c] if xi == 2 else va_ji1
            t2mk = cell(t2pv[(zi, yi)], zi, yi, c)
            w2 = jax.lax.dot_general(
                va, t2mk, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=kprec).reshape(o, o, o)
            if plan["post"] is not None:
                w2 = jnp.transpose(w2, plan["post"])
            accW = accW - w2
        V = accW + vterm[c]
        Z = (4.0 * V
             + jnp.transpose(V, (1, 2, 0))
             + jnp.transpose(V, (2, 0, 1))
             - 2.0 * jnp.transpose(V, (2, 1, 0))
             - 2.0 * jnp.transpose(V, (0, 2, 1))
             - 2.0 * jnp.transpose(V, (1, 0, 2)))
        eabc = evt_ref[0, A] + evt_ref[1, B] + evt_ref[2, c]
        zd = Z / (eijkv - eabc)
        if act_mode is not None:
            af = actv_ref[0, A] * actv_ref[1, B] * actv_ref[2, c]
            act6 = af * actoccv
            zd = zd * ((1.0 - act6) if act_mode == "exclude_active"
                       else act6)
        ga = gabc_ref[0, A]
        gb = gabc_ref[1, B]
        gc = gabc_ref[2, c]
        wgt = jnp.where((ga > gb) & (gb > gc), 1.0,
                        jnp.where((ga == gb) & (gb == gc), 1.0 / 6.0,
                                  jnp.where((ga >= gb) & (gb >= gc),
                                            0.5, 0.0)))
        eacc = eacc + (accW * zd) * wgt.astype(dtype)

    etot = jnp.sum(eacc)
    first = (A == 0) & (B == 0)

    @pl.when(first)
    def _():
        out_ref[0, 0] = etot

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0, 0] = out_ref[0, 0] + etot


# the six (zi, yi) role pairs addressed by the kernel's w2 t2-cells
_V2_T2P_PAIRS = tuple(sorted({(p[2], p[1]) for p in PERMS}))


def _kernel_entry_v2(o, T, act_mode, dtype, kprec, gabc, evt, actv, wsum,
                     vterm, wraw0, wraw1, va_ij0, va_ij1, va_ji1, va_ji2,
                     *rest):
    n = len(_V2_T2P_PAIRS)
    t2p_refs = dict(zip(_V2_T2P_PAIRS, rest[:n]))
    eijk, actocc, out = rest[n:]
    _combine_kernel_v2(o, T, act_mode, dtype, kprec,
                       (gabc, evt, actv, wsum, vterm, (wraw0, wraw1),
                        va_ij0, va_ij1, va_ji1, va_ji2, t2p_refs, eijk,
                        actocc, out))


def tile_energy_fused_v2(wsum, vterm, w_raw, vooo4_t, t2p, eijk, gabc, evt,
                         actv=None, actocc=None, act_mode=None,
                         interpret=False, kern_precision=None):
    """v2 tile energy: the fusable 4-perm W1 sum and the V term arrive
    precomputed in XLA canonical layout; the kernel adds the two raw
    p[0]==1 emit arrays (cheap per-cell slice + non-minor swap), does the
    w2 dots, the Z combine, and the reduction.

    wsum/vterm: (T, T, T, o, o, o) canonical tile arrays
    w_raw:      the two W1_RAW2 emit arrays in emit_w_dot layout
    vooo4_t:    (3, T, o, o, o)  [a, i, j, m] blocks at the tile starts
    t2p:        (3, 3, T, T, o, o) pair blocks ((m, k) cells)
    """
    T = wsum.shape[0]
    o = wsum.shape[-1]
    dtype = wsum.dtype
    # vooo pair layouts (small, built where XLA transposes are free)
    va_ij = vooo4_t.reshape(3, T, o * o, o)
    va_ji = vooo4_t.transpose(0, 1, 3, 2, 4).reshape(3, T, o * o, o)

    def full(shape):
        return pl.BlockSpec(shape, lambda A, B: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    col6 = pl.BlockSpec((None, None, T, o, o, o),
                        lambda A, B: (A, B, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def vooo_spec(r, fused_rows):
        shp = ((None, T if r == 2 else None, o * o, o) if fused_rows
               else (None, T if r == 2 else None, o, o * o))
        return pl.BlockSpec(shp, lambda A, B, r=r: (r, _gid(r, A, B), 0, 0),
                            memory_space=pltpu.VMEM)

    def pair_spec(r1, r2):
        return pl.BlockSpec(
            (None, None, T if r1 == 2 else None, T if r2 == 2 else None,
             o, o),
            lambda A, B, r1=r1, r2=r2: (r1, r2, _gid(r1, A, B),
                                        _gid(r2, A, B), 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = ([smem, smem, smem, col6, col6]
                + [_wspec(p, o, T) for p in W1_RAW2]
                + [vooo_spec(0, True), vooo_spec(1, True),
                   vooo_spec(1, True), vooo_spec(2, True)]
                + [pair_spec(r1, r2) for (r1, r2) in _V2_T2P_PAIRS]
                + [full((o, o, o)), full((o, o, o))])
    if actv is None:
        actv = jnp.zeros((3, T), dtype)
        actocc = jnp.zeros((o, o, o), dtype)

    kernel = partial(_kernel_entry_v2, o, T, act_mode, dtype,
                     kern_precision)
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=(T, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        interpret=interpret,
        **extra,
    )(gabc, evt, actv, wsum, vterm, w_raw[0], w_raw[1],
      va_ij, va_ij, va_ji, va_ji,
      *([t2p] * len(_V2_T2P_PAIRS)),
      eijk, actocc)
    return out[0, 0]


# ---------------------------------------------------------------------------
# v3 epilogue: full-lane W stream + resident small operands + in-kernel V
# ---------------------------------------------------------------------------
#
# The v2 measurements localize the remaining cost in DATA MOVEMENT, not
# compute: (a) every 6D tile array with a trailing (o, o) pair stores
# o=32 of the 128 lanes, so its HBM footprint — and DMA time — is 4x the
# logical bytes; (b) the kernel's ~12 small per-grid-step refs each pay
# fixed DMA latency 64 times per tile.  v3 removes both:
#
#   * ONE big streamed operand: the canonical W1 sum over ALL SIX perms.
#     The six emit arrays are summed by XLA at full lane width on their
#     pair-fused 5D views; the kernel reads one 6D array per (A, B) step
#     instead of six (v1) — 6x less streamed W traffic.  (The ideal of
#     streaming the PAIR-FUSED form all the way into the kernel is
#     blocked: Mosaic rejects the value-level minor split
#     (o, o*o) -> (o, o, o) — see the mosaic micro-probes — so the
#     handoff reshape pays one relayout write in XLA.)
#   * The V term moves back INTO the kernel (v1-style): its operands are
#     a few MB per tile, so computing V on the VPU is far cheaper than
#     round-tripping a 67 MB (x4 padded) vterm array through HBM.
#   * Every small operand is passed WHOLE with a constant index map:
#     Pallas fetches it once and keeps it resident across the (T, T)
#     grid; the kernel addresses (A, B) cells with pl.ds REF loads on
#     major dims (value-level dynamic_slice does not lower).
W1_CANON_FUSE2 = {p: W1_CANON[p] for p in W1_RAW2}


def canonical_w1_sum6(w_list, T, o):
    """Canonical (ta,tb,tc,i,j,k) sum of all six emit_w_dot outputs.

    The SUM runs at full lane width on the pair-fused 5D views (four
    perms by cheap fused-view transposes, two by one 6D relayout each);
    only the final handoff reshape to 6D pays the minor-split relayout —
    the kernel cannot split the fused minor itself (Mosaic rejects
    value-level (o, o*o) -> (o, o, o); see the mosaic micro-probes)."""
    acc = None
    for p, w in zip(PERMS, w_list):
        ax5 = W1_FUSED4.get(p)
        if ax5 is not None:
            w5 = w.reshape(w.shape[:4] + (w.shape[4] * w.shape[5],))
            wt = jnp.transpose(w5, ax5)
        else:
            wt = jnp.transpose(w, W1_CANON[p]).reshape(T, T, T, o, o * o)
        acc = wt if acc is None else acc + wt
    return acc.reshape(T, T, T, o, o, o)


def _combine_kernel_v3(o, T, act_mode, dtype, kprec, refs):
    (gabc_ref, evt_ref, actv_ref, wsum_ref, va_ref, t2p_ref, oovv_ref,
     t1r_ref, fvor_ref, t1c_ref, fvoc_ref, eijk_ref, actocc_ref,
     out_ref) = refs
    A = pl.program_id(0)
    B = pl.program_id(1)
    eacc = jnp.zeros((o, o, o), dtype)   # vector energy accumulator
    wsum = wsum_ref[...]            # (T, o, o, o) streamed (A, B) column
    eijkv = eijk_ref[...]
    actoccv = actocc_ref[...] if act_mode is not None else None

    def _ridx(r, c):
        return A if r == 0 else (B if r == 1 else c)

    # Dynamic (A, B)-cell addressing stays at the REF level: Mosaic has no
    # value-level dynamic_slice, but pl.ds loads on major dims lower fine;
    # the singleton dims are squeezed statically.
    def _pair(ref, r1, r2, c):
        # (o, o) cell of a resident (3, 3, T, T, o, o) pair ref
        blk = ref[r1, r2, pl.ds(_ridx(r1, c), 1), pl.ds(_ridx(r2, c), 1)]
        return blk[0, 0]

    def _occ(ref, r, c):
        # (x, y) cell of a resident (3, T, x, y) ref
        return ref[r, pl.ds(_ridx(r, c), 1)][0]

    for c in range(T):
        # ---- W1 (all six perms, pre-summed in XLA on canonical axes)
        accW = wsum[c]
        # ---- subtract the six w2 dots; build V in-register
        accV = jnp.zeros((o, o, o), dtype)
        for p in PERMS:
            xi, yi, zi = p
            plan = W2_PLAN[p]
            vab = va_ref[0 if plan["pair"] == "ij" else 1, xi,
                         pl.ds(_ridx(xi, c), 1)][0]
            t2mk = _pair(t2p_ref, zi, yi, c)
            # w2[(i,j), k'] = sum_m va[(i,j), m] t2[m, k']; the (o*o, o)
            # output splits on a MAJOR dim (v2-proven under Mosaic)
            w2 = jax.lax.dot_general(
                vab, t2mk, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=kprec).reshape(o, o, o)
            if plan["post"] is not None:
                w2 = jnp.transpose(w2, plan["post"])
            accW = accW - w2
            # V term, canonical placement (same algebra as the v1 kernel)
            inv = (p.index(0), p.index(1), p.index(2))
            oovv_ij = _pair(oovv_ref, xi, yi, c)
            t2ij = _pair(t2p_ref, yi, xi, c)
            pos = (inv.index(0), inv.index(1), inv.index(2))
            if pos[0] < pos[1]:
                a = jnp.expand_dims(oovv_ij, axis=pos[2])
                cc = jnp.expand_dims(t2ij, axis=pos[2])
            else:
                a = jnp.expand_dims(oovv_ij.T, axis=pos[2])
                cc = jnp.expand_dims(t2ij.T, axis=pos[2])
            if pos[2] == 2:
                b = _occ(t1r_ref, zi, c)[0, :][None, None, :]
                d = _occ(fvor_ref, zi, c)[0, :][None, None, :]
            elif pos[2] == 1:
                b = jnp.expand_dims(_occ(t1c_ref, zi, c), 0)
                d = jnp.expand_dims(_occ(fvoc_ref, zi, c), 0)
            else:
                b = jnp.expand_dims(_occ(t1c_ref, zi, c), 2)
                d = jnp.expand_dims(_occ(fvoc_ref, zi, c), 2)
            accV = accV + 0.5 * (a * b + cc * d)
        V = accV + accW
        Z = (4.0 * V
             + jnp.transpose(V, (1, 2, 0))
             + jnp.transpose(V, (2, 0, 1))
             - 2.0 * jnp.transpose(V, (2, 1, 0))
             - 2.0 * jnp.transpose(V, (0, 2, 1))
             - 2.0 * jnp.transpose(V, (1, 0, 2)))
        eabc = evt_ref[0, A] + evt_ref[1, B] + evt_ref[2, c]
        zd = Z / (eijkv - eabc)
        if act_mode is not None:
            af = actv_ref[0, A] * actv_ref[1, B] * actv_ref[2, c]
            act6 = af * actoccv
            zd = zd * ((1.0 - act6) if act_mode == "exclude_active"
                       else act6)
        ga = gabc_ref[0, A]
        gb = gabc_ref[1, B]
        gc = gabc_ref[2, c]
        wgt = jnp.where((ga > gb) & (gb > gc), 1.0,
                        jnp.where((ga == gb) & (gb == gc), 1.0 / 6.0,
                                  jnp.where((ga >= gb) & (gb >= gc),
                                            0.5, 0.0)))
        eacc = eacc + (accW * zd) * wgt.astype(dtype)

    etot = jnp.sum(eacc)
    first = (A == 0) & (B == 0)

    @pl.when(first)
    def _():
        out_ref[0, 0] = etot

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0, 0] = out_ref[0, 0] + etot


def _kernel_entry_v3(o, T, act_mode, dtype, kprec, *refs):
    _combine_kernel_v3(o, T, act_mode, dtype, kprec, refs)


def tile_energy_fused_v3(wsum, vooo4_t, t2p, oovv_t, t1_t, fvo_t, t1c_t,
                         fvoc_t, eijk, gabc, evt, actv=None, actocc=None,
                         act_mode=None, interpret=False,
                         kern_precision=None):
    """v3 tile energy: one pair-fused streamed W1 operand, resident small
    operands, in-kernel V term.  See the design note above.

    wsum:    (T, T, T, o, o, o) canonical W1 sum (all 6 perms)
    vooo4_t: (3, T, o, o, o)  [a, i, j, m] blocks at the tile starts
    t2p:     (3, 3, T, T, o, o);  oovv_t: (3, 3, T, T, o, o)
    t1_t/fvo_t: (3, T, 1, o);  t1c_t/fvoc_t: (3, T, o, 1)
    """
    T = wsum.shape[0]
    o = t2p.shape[-1]
    dtype = wsum.dtype
    # both vooo pair layouts, m minor: va[l, r, t, (i j), m] (the v2-proven
    # in-kernel dot orientation)
    va = jnp.stack([
        vooo4_t.reshape(3, T, o * o, o),
        vooo4_t.transpose(0, 1, 3, 2, 4).reshape(3, T, o * o, o)])

    def full(shape):
        return pl.BlockSpec(shape, lambda A, B: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    wcol = pl.BlockSpec((None, None, T, o, o, o),
                        lambda A, B: (A, B, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [smem, smem, smem, wcol,
                full(va.shape), full(t2p.shape), full(oovv_t.shape),
                full(t1_t.shape), full(fvo_t.shape), full(t1c_t.shape),
                full(fvoc_t.shape), full((o, o, o)), full((o, o, o))]
    if actv is None:
        actv = jnp.zeros((3, T), dtype)
        actocc = jnp.zeros((o, o, o), dtype)

    kernel = partial(_kernel_entry_v3, o, T, act_mode, dtype,
                     kern_precision)
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=(T, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        interpret=interpret,
        **extra,
    )(gabc, evt, actv, wsum, va, t2p, oovv_t, t1_t, fvo_t, t1c_t, fvoc_t,
      eijk, actocc)
    return out[0, 0]


# ---------------------------------------------------------------------------
# v4 epilogue: single padded W stream, split-only un-fuse, b-basis kernel
# ---------------------------------------------------------------------------
#
# MEASURED OUTCOME (2026-08-18, v5e via the axon tunnel): v4 is SLOWER
# than v1 (13.2 vs 7.9 ms/tile at bench shape) and is kept as the
# documented experiment, not production.  The probe series that
# motivated and then falsified it:
#   * section-skip probes: disabling ALL v1 kernel compute (w2, V term,
#     Z transposes, W adds) recovers only 0.6 ms/tile -> the cost is
#     data movement, not compute;
#   * dots-only floor: the six W1 MXU dots run at 90 TFLOP/s
#     (1.09 ms/tile) -> XLA-side compute is not the bottleneck;
#   * XLA-prep-only (pallas call replaced by a trivial XLA consumer of
#     the same operands): 2.1 ms/tile -> the pallas call itself carries
#     ~6 ms/tile;
#   * pallas micro-probes: a grid-(64) kernel that only DMAs 64 x 1 MB
#     dense blocks runs at ~8 GB/s, and a no-input kernel writing the
#     same bytes through VMEM scratch runs at ~14 GB/s, while plain XLA
#     reads the identical arrays at full HBM bandwidth.
# Conclusion: on THIS runtime Mosaic kernels move data two orders of
# magnitude below HBM speed, so every byte-shuffling redesign (one
# stream instead of six, dense-minor layouts, XLA-side canonical sums)
# lands within noise of the same ~6 ms/tile floor or loses to the extra
# XLA relayout it introduces.  v1 ('fused') remains the production
# engine; the design below stands as the layout analysis and the
# b-basis machinery it proved out.
#
# Original design rationale: v1 streams SIX 6D operands whose trailing
# (o, o) dims lane-pad 4x (268 MB padded vs 67 MB dense each).  v4
# streams ONE canonical W1 sum in ((j,k)-fused, i) order (T,T,T,o*o,o)
# and un-fuses each cell with only the Mosaic-proven MAJOR-dim split
# (o*o, o) -> (o, o, o), no in-kernel relayout.  (The fully-dense
# (..., o, o*o) variant was measured too: the then-required per-cell
# (o, o*o) -> (o*o, o) in-kernel transpose runs at ~24 GB/s on v5e and
# eats the entire saving.)
#
# The split lands the cell in the (j, k, i) basis.  By S3 conjugation the
# Z combine is form-invariant under any uniform relabeling (its
# coefficients are constant on conjugacy classes: identity 4, 3-cycles
# +1, transpositions -2), so the kernel runs ENTIRELY in the (j, k, i)
# basis: denominators, masks and weights are symmetric or per-cell
# scalars, and the w2/V-term placements are re-derived below (same cost
# profile as v1: one w2 emission direct, one a cheap non-minor swap,
# four one in-cell transpose).  Everything else keeps v1's structure —
# per-grid-step BlockSpec slices, which measured FASTER than v3's
# resident-ref pl.ds addressing.  Reference spec unchanged:
# pyscf/lib/cc/ccsd_t.c:39-230.
#
# b-basis bookkeeping: b-dims carry canonical occupied ids (j, k, i) =
# (1, 2, 0); canonical id c lives at b-position _BPOS[c].
_BPOS = {0: 2, 1: 0, 2: 1}

# w2 emission: the in-kernel dot keeps the t2-side occupied LAST
# (k'-leading needs a minor split, Mosaic rejects), so the emitted
# canonical-id order is (p[0], p[1], p[2]) with the v1 ((i,j), m) vooo
# layout; post maps it onto the b-target (1, 2, 0).
W2B_POST = {p: (lambda ax: None if ax == (0, 1, 2) else ax)(
    tuple(p.index(t) for t in (1, 2, 0))) for p in PERMS}


def canonical_w1_sum6_5d(w_list, T, o):
    """The canonical W1 sum in ((j,k)-fused, i) order: (T,T,T,o*o,o).

    Built exactly like canonical_w1_sum6 but with the occupied i axis
    moved last, so the v4 kernel's per-cell un-fuse is a pure MAJOR-dim
    split.  XLA fuses the six transposes into the add loop."""
    acc = None
    for p, w in zip(PERMS, w_list):
        ax5 = W1_FUSED4.get(p)
        if ax5 is not None:
            w5 = w.reshape(w.shape[:4] + (w.shape[4] * w.shape[5],))
            wt = jnp.transpose(w5, ax5)
        else:
            wt = jnp.transpose(w, W1_CANON[p]).reshape(T, T, T, o, o * o)
        acc = wt if acc is None else acc + wt
    return acc.transpose(0, 1, 2, 4, 3)


def _combine_kernel_v4(o, T, act_mode, dtype, kprec, refs):
    """v1's column kernel in the b-basis with the single W stream."""
    (gabc_ref, evt_ref, actv_ref, wsum_ref, vooo_refs, t2p_refs,
     oovv_refs, t1_refs, fvo_refs, t1c_refs, fvoc_refs, eijk_ref,
     actocc_ref, out_ref) = refs
    A = pl.program_id(0)
    B = pl.program_id(1)
    eacc = jnp.zeros((o, o, o), dtype)   # vector energy accumulator
    wsum = wsum_ref[...]            # (T, o*o, o) streamed (A, B) column
    t2pv = [t2p_refs[k][...] for k in range(6)]
    oovvv = [oovv_refs[k][...] for k in range(6)]
    voov = [vooo_refs[r][...] for r in range(3)]
    t1v = [t1_refs[r][...] for r in range(3)]
    fvov = [fvo_refs[r][...] for r in range(3)]
    t1cv = [t1c_refs[r][...] for r in range(3)]
    fvocv = [fvoc_refs[r][...] for r in range(3)]
    eijkv = eijk_ref[...]           # symmetric: valid in any S3 basis
    actoccv = actocc_ref[...] if act_mode is not None else None

    def pair_cell(vals, r1, r2, c):
        blk = vals[PAIRS.index((r1, r2))]
        return blk[c] if (r1 == 2 or r2 == 2) else blk

    def occ_cell(vals, r, c):
        return vals[r][c] if r == 2 else vals[r]

    for c in range(T):
        # ---- W1: pure major split of the streamed cell -> (j, k, i)
        accW = wsum[c].reshape(o, o, o)
        accV = jnp.zeros((o, o, o), dtype)
        for p in PERMS:
            xi, yi, zi = p
            t2mk = pair_cell(t2pv, zi, yi, c)
            vb = voov[xi][c] if xi == 2 else voov[xi]
            w2b = jax.lax.dot_general(
                vb, t2mk, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=kprec).reshape(o, o, o)
            post = W2B_POST[p]
            accW = accW - (w2b if post is None
                           else jnp.transpose(w2b, post))
            # V term placed on b-basis axes: canonical id d sits at
            # b-position _BPOS[d]
            q1, q2, q3 = _BPOS[p[0]], _BPOS[p[1]], _BPOS[p[2]]
            oovv_ij = pair_cell(oovvv, xi, yi, c)
            t2ij = pair_cell(t2pv, yi, xi, c)
            if q1 < q2:
                a = jnp.expand_dims(oovv_ij, axis=q3)
                cc = jnp.expand_dims(t2ij, axis=q3)
            else:
                a = jnp.expand_dims(oovv_ij.T, axis=q3)
                cc = jnp.expand_dims(t2ij.T, axis=q3)
            if q3 == 2:
                b = occ_cell(t1v, zi, c)[0, :][None, None, :]
                d = occ_cell(fvov, zi, c)[0, :][None, None, :]
            elif q3 == 1:
                b = jnp.expand_dims(occ_cell(t1cv, zi, c)[:, :], 0)
                d = jnp.expand_dims(occ_cell(fvocv, zi, c)[:, :], 0)
            else:
                b = jnp.expand_dims(occ_cell(t1cv, zi, c)[:, :], 2)
                d = jnp.expand_dims(occ_cell(fvocv, zi, c)[:, :], 2)
            accV = accV + 0.5 * (a * b + cc * d)
        V = accV + accW
        # Z combine: S3-conjugation-invariant, so identical in b-basis
        Vx = jnp.transpose(V, (1, 2, 0))
        Vy = jnp.transpose(V, (2, 0, 1))
        Z = (4.0 * V
             + Vx
             + Vy
             - 2.0 * jnp.transpose(Vy, (1, 0, 2))
             - 2.0 * jnp.transpose(Vx, (1, 0, 2))
             - 2.0 * jnp.transpose(V, (1, 0, 2)))
        eabc = evt_ref[0, A] + evt_ref[1, B] + evt_ref[2, c]
        zd = Z / (eijkv - eabc)
        if act_mode is not None:
            af = actv_ref[0, A] * actv_ref[1, B] * actv_ref[2, c]
            act6 = af * actoccv
            zd = zd * ((1.0 - act6) if act_mode == "exclude_active"
                       else act6)
        ga = gabc_ref[0, A]
        gb = gabc_ref[1, B]
        gc = gabc_ref[2, c]
        wgt = jnp.where((ga > gb) & (gb > gc), 1.0,
                        jnp.where((ga == gb) & (gb == gc), 1.0 / 6.0,
                                  jnp.where((ga >= gb) & (gb >= gc),
                                            0.5, 0.0)))
        eacc = eacc + (accW * zd) * wgt.astype(dtype)

    etot = jnp.sum(eacc)
    first = (A == 0) & (B == 0)

    @pl.when(first)
    def _():
        out_ref[0, 0] = etot

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0, 0] = out_ref[0, 0] + etot


def _kernel_entry_v4(o, T, act_mode, dtype, kprec, gabc, evt, actv, wsum,
                     *rest):
    vooo = rest[0:3]
    t2p = rest[3:9]
    oovv = rest[9:15]
    t1 = rest[15:18]
    fvo = rest[18:21]
    t1c = rest[21:24]
    fvoc = rest[24:27]
    eijk, actocc, out = rest[27], rest[28], rest[29]
    _combine_kernel_v4(o, T, act_mode, dtype, kprec,
                       (gabc, evt, actv, wsum, vooo, t2p, oovv, t1, fvo,
                        t1c, fvoc, eijk, actocc, out))


def tile_energy_fused_v4(wsum5, vooo_t, t2p, oovv_t, t1_t, fvo_t, t1c_t,
                         fvoc_t, eijk, gabc, evt, actv=None, actocc=None,
                         act_mode=None, interpret=False,
                         kern_precision=None):
    """v4 tile energy: single W stream + v1-structure small slices.

    wsum5:   (T, T, T, o*o, o) canonical W1 sum, (j,k)-fused with i last
    other operands exactly as tile_energy_fused (v1).
    """
    T = wsum5.shape[0]
    o = t2p.shape[-1]
    dtype = wsum5.dtype

    def full(shape):
        return pl.BlockSpec(shape, lambda A, B: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    wcol = pl.BlockSpec((None, None, T, o * o, o),
                        lambda A, B: (A, B, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    vooo_specs = [pl.BlockSpec(
        (None, T if r == 2 else None, o * o, o),
        lambda A, B, r=r: (r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]
    pair_specs = [pl.BlockSpec(
        (None, None, T if r1 == 2 else None, T if r2 == 2 else None, o, o),
        lambda A, B, r1=r1, r2=r2: (r1, r2, _gid(r1, A, B),
                                    _gid(r2, A, B), 0, 0),
        memory_space=pltpu.VMEM) for (r1, r2) in PAIRS]
    occ_specs = [pl.BlockSpec(
        (None, T if r == 2 else None, 1, o),
        lambda A, B, r=r: (r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]
    occc_specs = [pl.BlockSpec(
        (None, T if r == 2 else None, o, 1),
        lambda A, B, r=r: (r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]

    in_specs = ([smem, smem, smem, wcol]
                + vooo_specs + pair_specs + pair_specs
                + occ_specs + occ_specs + occc_specs + occc_specs
                + [full((o, o, o)), full((o, o, o))])
    if actv is None:
        actv = jnp.zeros((3, T), dtype)
        actocc = jnp.zeros((o, o, o), dtype)

    kernel = partial(_kernel_entry_v4, o, T, act_mode, dtype,
                     kern_precision)
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=(T, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        interpret=interpret,
        **extra,
    )(gabc, evt, actv, wsum5,
      vooo_t, vooo_t, vooo_t,
      t2p, t2p, t2p, t2p, t2p, t2p,
      oovv_t, oovv_t, oovv_t, oovv_t, oovv_t, oovv_t,
      t1_t, t1_t, t1_t, fvo_t, fvo_t, fvo_t,
      t1c_t, t1c_t, t1c_t, fvoc_t, fvoc_t, fvoc_t,
      eijk, actocc)
    return out[0, 0]


def emit_w_dot(p, ovb, t2op, dtype, T, o, precision=None):
    """The perm-p W1 dot in its canonical-emission form (see W_PLAN).

    ovb: (x, y, i', f) block; t2op: (z, f, pair) slice in the layout
    W_PLAN[p]['t2'].  Returns the 6D array the kernel's BlockSpec reads.
    """
    nvp = t2op.shape[1]
    if W_PLAN[p]["order"] == "ov_first":
        w = jax.lax.dot_general(ovb, t2op, (((3,), (1,)), ((), ())),
                                preferred_element_type=dtype,
                                precision=precision)
        return w.reshape(T, T, o, T, o, o)       # (x, y, i, z, P1, P2)
    w = jax.lax.dot_general(t2op, ovb, (((1,), (3,)), ((), ())),
                            preferred_element_type=dtype,
                            precision=precision)
    # (z,(P1 P2),x,y,i) -> (z,x,y,(P1 P2),i): the minor dim i stays
    # minor, so this transpose is a major-dim shuffle (cheap), then a
    # supported major split of the fused pair
    w = jnp.transpose(w, (0, 2, 3, 1, 4))
    return w.reshape(T, T, T, o, o, o)            # (z, x, y, P1, P2, i)


def _gid(role, A, B):
    """Block id for a tile dim: grid coordinate, or 0 when the dim is
    the whole C column."""
    return (A, B)[role] if role != 2 else 0


def _wspec(p, o, T):
    xi, yi, zi = p
    if W_PLAN[p]["order"] == "ov_first":
        # array (x, y, i, z, P1, P2); role-2 dim fetched whole
        return pl.BlockSpec(
            (T if xi == 2 else None, T if yi == 2 else None, o,
             T if zi == 2 else None, o, o),
            lambda A, B, xi=xi, yi=yi, zi=zi: (
                _gid(xi, A, B), _gid(yi, A, B), 0, _gid(zi, A, B), 0, 0),
            memory_space=pltpu.VMEM)
    # array (z, x, y, P1, P2, i); x always carries role 2 here
    return pl.BlockSpec(
        (T if zi == 2 else None, T, None, o, o, o),
        lambda A, B, xi=xi, yi=yi, zi=zi: (
            _gid(zi, A, B), 0, _gid(yi, A, B), 0, 0, 0),
        memory_space=pltpu.VMEM)


def tile_energy_fused(w_list, vooo_t, t2p, oovv_t, t1_t, fvo_t, t1c_t,
                      fvoc_t, eijk, gabc, evt, actv=None, actocc=None,
                      act_mode=None, interpret=False, kern_precision=None):
    """Tile energy from the six dot outputs + small per-tile slices.

    w_list:  6 arrays from emit_w_dot (canonical-emission layouts)
    vooo_t:  (3, T, o*o, o)     [(i,j), m] blocks at the three tile starts
    t2p:     (3, 3, T, T, o, o) t2 pair blocks [m/j, k] for every role pair
    oovv_t:  (3, 3, T, T, o, o) (ix|jy) blocks
    t1_t:    (3, T, 1, o);  t1c_t: (3, T, o, 1)  (column orientation)
    fvo_t:   (3, T, 1, o);  fvoc_t: (3, T, o, 1)
    eijk:    (o, o, o); gabc: (3, T) int32 global virtuals; evt: (3, T)
    """
    T = w_list[0].shape[0]
    o = t2p.shape[-1]
    dtype = w_list[0].dtype

    def full(shape):
        return pl.BlockSpec(shape, lambda A, B: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vooo_specs = [pl.BlockSpec(
        (None, T if r == 2 else None, o * o, o),
        lambda A, B, r=r: (r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]
    pair_specs = [pl.BlockSpec(
        (None, None, T if r1 == 2 else None, T if r2 == 2 else None, o, o),
        lambda A, B, r1=r1, r2=r2: (r1, r2, _gid(r1, A, B),
                                    _gid(r2, A, B), 0, 0),
        memory_space=pltpu.VMEM) for (r1, r2) in PAIRS]
    occ_specs = [pl.BlockSpec(
        (None, T if r == 2 else None, 1, o),
        lambda A, B, r=r: (r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]
    occc_specs = [pl.BlockSpec(
        (None, T if r == 2 else None, o, 1),
        lambda A, B, r=r: (r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]

    in_specs = ([smem, smem, smem]
                + [_wspec(p, o, T) for p in PERMS]
                + vooo_specs + pair_specs + pair_specs
                + occ_specs + occ_specs + occc_specs + occc_specs
                + [full((o, o, o)), full((o, o, o))])
    if actv is None:
        actv = jnp.zeros((3, T), dtype)
        actocc = jnp.zeros((o, o, o), dtype)

    kernel = partial(_kernel_entry, o, T, act_mode, dtype, kern_precision)
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=(T, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        interpret=interpret,
        **extra,
    )(gabc, evt, actv, *w_list,
      vooo_t, vooo_t, vooo_t,
      t2p, t2p, t2p, t2p, t2p, t2p,
      oovv_t, oovv_t, oovv_t, oovv_t, oovv_t, oovv_t,
      t1_t, t1_t, t1_t, fvo_t, fvo_t, fvo_t,
      t1c_t, t1c_t, t1c_t, fvoc_t, fvoc_t, fvoc_t,
      eijk, actocc)
    return out[0, 0]
