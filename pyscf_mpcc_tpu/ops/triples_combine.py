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


# --------------------------------------------------------------------------
# FLAT stream layout: the 6D canonical-emission W arrays have minor dims
# (o, o) = (32, 32) at production occupancy — Mosaic's fp32 (8, 128)
# tiling stores AND streams them 4.0x lane-padded (measured: the K=8
# chunk engine allocates 2.00 GiB per 512 MiB stream, and the whole
# fused engine's ~5.8 ms/tile floor is this padded traffic).  The flat
# layout fuses the role-2 (column) tile dim with the canonical-k
# occupied axis into the minor: (sel0, sel1, i, j, T*o) — sublane 32,
# lane 256, ZERO padding.  Emission: the same dots, one XLA transpose
# (full-bandwidth, unlike Mosaic's strided DMA), a free reshape.  The
# kernel's cell extraction becomes a STATIC lane slice, and the XLA
# transpose absorbs every occupied-axis swap — no in-kernel transposes
# remain for any perm.
#
# FLAT_PLAN[p] = (transpose of the 6D emission, grid roles of the two
# leading dims after it).  Derivation per perm: source occupied d lands
# at canonical slot p[d]; the pair layout ('jk'/'kj' per W_PLAN) fixes
# which pair member is canonical k; the transpose orders the axes as
# (sel0, sel1, canonical-i, canonical-j, role2-tile, canonical-k).
FLAT_PLAN = {
    (0, 1, 2): ((0, 1, 2, 4, 3, 5), ("A", "B")),
    (0, 2, 1): ((0, 3, 2, 4, 1, 5), ("A", "B")),
    (1, 0, 2): ((0, 1, 4, 2, 3, 5), ("B", "A")),
    (1, 2, 0): ((0, 3, 4, 2, 1, 5), ("B", "A")),
    (2, 0, 1): ((0, 2, 3, 4, 1, 5), ("B", "A")),
    (2, 1, 0): ((0, 2, 3, 4, 1, 5), ("A", "B")),
}


def emit_w_dot_flat(p, ovb, t2op, dtype, T, o, precision=None):
    """Perm-p W1 dot emitted in the flat layout (sel0, sel1, i, j, T*o)."""
    w = emit_w_dot(p, ovb, t2op, dtype, T, o, precision=precision)
    w = jnp.transpose(w, FLAT_PLAN[p][0])
    return w.reshape(w.shape[0], w.shape[1], o, o, T * o)


def _w_cell_flat(blk, c, o):
    """Canonical (o,o,o) cell from a flat W block (o, o, T*o): a static
    32-lane slice — no transposes (the emission transpose did them)."""
    return jax.lax.slice_in_dim(blk, c * o, (c + 1) * o, axis=2)


def _debug_skip():
    """Timing-diagnostic only: TRIPLES_DEBUG_SKIP=w2,vterm,zperm,w1read
    disables kernel sections so their cost can be measured additively.
    Results are WRONG with any token set; never set in production."""
    import os
    v = os.environ.get("TRIPLES_DEBUG_SKIP", "")
    return frozenset(t for t in v.split(",") if t)


def _combine_kernel(o, T, act_mode, dtype, kprec, refs, batched=False,
                    flat=False):
    """Column kernel: one invocation per (A, B) pair processes all T
    C-cells (amortizes per-grid-cell dispatch, measured 2.3x on v5e vs
    the cell-grid variant at (H2O)8 scale).

    batched=True is the grid-batched chunk form: the grid gains a
    leading tile axis k, per-tile VMEM blocks are selected by their
    index maps, and the SMEM metadata refs carry a leading K axis read
    with k here.  One pallas_call then covers a whole chunk of tiles,
    amortizing the per-call dispatch overhead (measured ~6 ms/tile when
    invoked one-call-per-tile inside lax.scan — the round-3 roofline's
    dominant term)."""
    skip = _debug_skip()
    (gabc_ref, evt_ref, actv_ref, w_refs, vooo_refs, t2p_refs, oovv_refs,
     t1_refs, fvo_refs, t1c_refs, fvoc_refs, eijk_ref, actocc_ref,
     out_ref) = refs
    if batched:
        k = pl.program_id(0)
        A = pl.program_id(1)
        B = pl.program_id(2)

        def smem2(ref, r, i):
            return ref[k, r, i]
    else:
        A = pl.program_id(0)
        B = pl.program_id(1)

        def smem2(ref, r, i):
            return ref[r, i]
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
        # ---- W1: canonical up to a non-minor (1,0,2) swap (6D mode);
        # in flat mode every cell is a static lane slice, already
        # canonical for all six perms
        accW = jnp.zeros((o, o, o), dtype)
        for pi, p in enumerate(PERMS):
            accW = accW + (_w_cell_flat(wv[pi], c, o) if flat
                           else _w_cell(p, wv[pi], c))
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
        eabc = smem2(evt_ref, 0, A) + smem2(evt_ref, 1, B) \
            + smem2(evt_ref, 2, c)
        ga = smem2(gabc_ref, 0, A)
        gb = smem2(gabc_ref, 1, B)
        gc = smem2(gabc_ref, 2, c)
        wgt = jnp.where((ga > gb) & (gb > gc), 1.0,
                        jnp.where((ga == gb) & (gb == gc), 1.0 / 6.0,
                                  jnp.where((ga >= gb) & (gb >= gc),
                                            0.5, 0.0)))
        if act_mode is not None:
            af = (smem2(actv_ref, 0, A) * smem2(actv_ref, 1, B)
                  * smem2(actv_ref, 2, c))
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
    if batched:
        # whole-(K,1) SMEM output; per-tile slot k, reset at the tile's
        # first (A,B) grid step
        @pl.when(first)
        def _():
            out_ref[k, 0] = etot

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[k, 0] = out_ref[k, 0] + etot
    else:
        @pl.when(first)
        def _():
            out_ref[0, 0] = etot

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, 0] = out_ref[0, 0] + etot


def _kernel_entry(o, T, act_mode, dtype, kprec, flat, gabc, evt, actv,
                  *rest):
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
                     fvoc, eijk, actocc, out), flat=flat)


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


def _wspec_flat(p, o, T):
    """BlockSpec for a flat stream (sel0, sel1, i, j, T*o)."""
    r0, r1 = FLAT_PLAN[p][1]
    return pl.BlockSpec(
        (None, None, o, o, T * o),
        lambda A, B, r0=r0, r1=r1: (A if r0 == "A" else B,
                                    A if r1 == "A" else B, 0, 0, 0),
        memory_space=pltpu.VMEM)


def _wspec_flat_chunk(p, o, T):
    r0, r1 = FLAT_PLAN[p][1]
    return pl.BlockSpec(
        (None, None, None, o, o, T * o),
        lambda k, A, B, r0=r0, r1=r1: (k, A if r0 == "A" else B,
                                       A if r1 == "A" else B, 0, 0, 0),
        memory_space=pltpu.VMEM)


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
                      act_mode=None, interpret=False, kern_precision=None,
                      flat=False):
    """Tile energy from the six dot outputs + small per-tile slices.

    w_list:  6 arrays from emit_w_dot (canonical-emission layouts), or
             from emit_w_dot_flat when flat=True (unpadded streams)
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
                + [(_wspec_flat(p, o, T) if flat else _wspec(p, o, T))
                   for p in PERMS]
                + vooo_specs + pair_specs + pair_specs
                + occ_specs + occ_specs + occc_specs + occc_specs
                + [full((o, o, o)), full((o, o, o))])
    if actv is None:
        actv = jnp.zeros((3, T), dtype)
        actocc = jnp.zeros((o, o, o), dtype)

    kernel = partial(_kernel_entry, o, T, act_mode, dtype, kern_precision,
                     flat)
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


# ---------------------------------------------------------------------------
# Grid-batched chunk form: one pallas_call for K tiles (grid = (K, T, T))
# ---------------------------------------------------------------------------
#
# The round-3 roofline measured ~6 of the 7.9 ms/tile as the pallas_call
# dispatch itself when the kernel is invoked once per tile inside
# lax.scan.  This form stacks every per-tile input with a leading K axis
# and runs ONE pallas_call whose grid leads with the tile index, so the
# Mosaic pipeline streams straight through K tiles and the dispatch cost
# is paid once per chunk.  Same spec shapes as tile_energy_fused with a
# size-None leading dim selected by k; SMEM metadata (gabc/evt/actv)
# stays whole and is indexed with k inside the kernel (_combine_kernel
# batched=True).  Reference analog: lib/cc/ccsd_t.c:378 runs ONE OpenMP
# region over all abc jobs for exactly the same amortization.

def _kernel_entry_chunk(o, T, act_mode, dtype, kprec, flat, gabc, evt,
                        actv, *rest):
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
                     fvoc, eijk, actocc, out), batched=True, flat=flat)


def _wspec_chunk(p, o, T):
    xi, yi, zi = p
    if W_PLAN[p]["order"] == "ov_first":
        # array (K, x, y, i, z, P1, P2); role-2 dim fetched whole
        return pl.BlockSpec(
            (None, T if xi == 2 else None, T if yi == 2 else None, o,
             T if zi == 2 else None, o, o),
            lambda k, A, B, xi=xi, yi=yi, zi=zi: (
                k, _gid(xi, A, B), _gid(yi, A, B), 0, _gid(zi, A, B), 0, 0),
            memory_space=pltpu.VMEM)
    # array (K, z, x, y, P1, P2, i); x always carries role 2 here
    return pl.BlockSpec(
        (None, T if zi == 2 else None, T, None, o, o, o),
        lambda k, A, B, xi=xi, yi=yi, zi=zi: (
            k, _gid(zi, A, B), 0, _gid(yi, A, B), 0, 0, 0),
        memory_space=pltpu.VMEM)


def tile_energy_fused_chunk(w_list, vooo_t, t2p, oovv_t, t1_t, fvo_t,
                            t1c_t, fvoc_t, eijk, gabc, evt, actv=None,
                            actocc=None, act_mode=None, interpret=False,
                            kern_precision=None, flat=False):
    """Per-tile energies (K,) for a stacked chunk of K tiles.

    Arguments are those of tile_energy_fused with a leading K axis on
    every per-tile array (w_list entries, vooo_t, t2p, oovv_t, t1*/fvo*,
    gabc, evt, actv); eijk/actocc are shared across the chunk."""
    K = t2p.shape[0]
    T = t2p.shape[3]
    o = t2p.shape[-1]
    dtype = w_list[0].dtype

    def full(shape):
        return pl.BlockSpec(shape, lambda k, A, B: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vooo_specs = [pl.BlockSpec(
        (None, None, T if r == 2 else None, o * o, o),
        lambda k, A, B, r=r: (k, r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]
    pair_specs = [pl.BlockSpec(
        (None, None, None, T if r1 == 2 else None, T if r2 == 2 else None,
         o, o),
        lambda k, A, B, r1=r1, r2=r2: (k, r1, r2, _gid(r1, A, B),
                                       _gid(r2, A, B), 0, 0),
        memory_space=pltpu.VMEM) for (r1, r2) in PAIRS]
    occ_specs = [pl.BlockSpec(
        (None, None, T if r == 2 else None, 1, o),
        lambda k, A, B, r=r: (k, r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]
    occc_specs = [pl.BlockSpec(
        (None, None, T if r == 2 else None, o, 1),
        lambda k, A, B, r=r: (k, r, _gid(r, A, B), 0, 0),
        memory_space=pltpu.VMEM) for r in range(3)]

    in_specs = ([smem, smem, smem]
                + [(_wspec_flat_chunk(p, o, T) if flat
                    else _wspec_chunk(p, o, T)) for p in PERMS]
                + vooo_specs + pair_specs + pair_specs
                + occ_specs + occ_specs + occc_specs + occc_specs
                + [full((o, o, o)), full((o, o, o))])
    if actv is None:
        actv = jnp.zeros((K, 3, T), dtype)
        actocc = jnp.zeros((o, o, o), dtype)

    kernel = partial(_kernel_entry_chunk, o, T, act_mode, dtype,
                     kern_precision, flat)
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=(K, T, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((K, 1), dtype),
        interpret=interpret,
        **extra,
    )(gabc, evt, actv, *w_list,
      vooo_t, vooo_t, vooo_t,
      t2p, t2p, t2p, t2p, t2p, t2p,
      oovv_t, oovv_t, oovv_t, oovv_t, oovv_t, oovv_t,
      t1_t, t1_t, t1_t, fvo_t, fvo_t, fvo_t,
      t1c_t, t1c_t, t1c_t, fvoc_t, fvoc_t, fvoc_t,
      eijk, actocc)
    return out[:, 0]
