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
(T,T,T,o,o,o) accumulators six times each through HBM with 4x-padded
layouts (trailing dim nocc < 128 lanes) — the measured 3 TFLOP/s
bottleneck of round 1.  This kernel fuses all of (b): the grid walks the
(T,T,T) unit triples of a tile, each cell reads one (o,o,o) block from
each of the six dot outputs (the *tile-level* permutation is free — it is
just the BlockSpec index map), performs the *occupied-level* permutations
in VMEM (native 3D transposes), recomputes the cheap w2/v terms
in-register, and accumulates the tile energy.  W and V never exist in HBM.

Mosaic layout rules respected here: 3D transposes on native (o,o,o)
blocks are supported; lane-splitting reshapes like (o, o*o) -> (o,o,o)
are NOT — so every block arrives from HBM already in its kernel shape,
and the only in-kernel reshape is the supported major-dim split
(o*o, o) -> (o, o, o) on the w2 matmul output.
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


def _combine_kernel(o, T, act_mode, dtype, refs):
    (gabc_ref, evt_ref, actv_ref, w_refs, vooo_refs, t2p_refs, oovv_refs,
     t1_refs, fvo_refs, eijk_ref, actocc_ref, out_ref) = refs
    A = pl.program_id(0)
    B = pl.program_id(1)
    C = pl.program_id(2)

    accW = jnp.zeros((o, o, o), dtype)
    accV = jnp.zeros((o, o, o), dtype)
    for pi, p in enumerate(PERMS):
        xi, yi, zi = p
        blk = w_refs[pi][:, :, :]                       # (i', j', k')
        # w2[i',j',k'] = sum_m vooo[x][(i',j'),m] t2[m,k' | z,y]
        t2mk = t2p_refs[PAIRS.index((zi, yi))][:, :]    # (m, k')
        w2b = jax.lax.dot_general(
            vooo_refs[xi][:, :], t2mk, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype).reshape(o, o, o)
        # v = ((i'x|j'y) t1[k',z] + t2[j',i'|y,x] fvo[z,k']) / 2
        oovv_ij = oovv_refs[PAIRS.index((xi, yi))][:, :]
        t1k = t1_refs[zi][0, :]
        t2ij = t2p_refs[PAIRS.index((yi, xi))][:, :]
        fvok = fvo_refs[zi][0, :]
        vp = 0.5 * (oovv_ij[:, :, None] * t1k[None, None, :]
                    + t2ij[:, :, None] * fvok[None, None, :])
        inv = (p.index(0), p.index(1), p.index(2))
        accW = accW + jnp.transpose(blk - w2b, inv)
        accV = accV + jnp.transpose(vp, inv)

    V = accV + accW
    Z = (4.0 * V
         + jnp.transpose(V, (1, 2, 0))
         + jnp.transpose(V, (2, 0, 1))
         - 2.0 * jnp.transpose(V, (2, 1, 0))
         - 2.0 * jnp.transpose(V, (0, 2, 1))
         - 2.0 * jnp.transpose(V, (1, 0, 2)))

    eabc = evt_ref[0, A] + evt_ref[1, B] + evt_ref[2, C]
    denom = eijk_ref[:, :, :] - eabc
    zd = Z / denom

    if act_mode is not None:
        af = actv_ref[0, A] * actv_ref[1, B] * actv_ref[2, C]
        act6 = af * actocc_ref[:, :, :]
        zd = zd * ((1.0 - act6) if act_mode == "exclude_active" else act6)

    ga = gabc_ref[0, A]
    gb = gabc_ref[1, B]
    gc = gabc_ref[2, C]
    wgt = jnp.where((ga > gb) & (gb > gc), 1.0,
                    jnp.where((ga == gb) & (gb == gc), 1.0 / 6.0,
                              jnp.where((ga >= gb) & (gb >= gc), 0.5, 0.0)))
    e = jnp.sum(accW * zd) * wgt.astype(dtype)

    first = (A == 0) & (B == 0) & (C == 0)

    @pl.when(first)
    def _():
        out_ref[0, 0] = e

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0, 0] = out_ref[0, 0] + e


def _kernel_entry(o, T, act_mode, dtype, gabc, evt, actv, *rest):
    w = rest[0:6]
    vooo = rest[6:9]
    t2p = rest[9:15]
    oovv = rest[15:21]
    t1 = rest[21:24]
    fvo = rest[24:27]
    eijk, actocc, out = rest[27], rest[28], rest[29]
    _combine_kernel(o, T, act_mode, dtype,
                    (gabc, evt, actv, w, vooo, t2p, oovv, t1, fvo,
                     eijk, actocc, out))


def tile_energy_fused(w_list, vooo_t, t2p, oovv_t, t1_t, fvo_t, eijk,
                      gabc, evt, actv=None, actocc=None, act_mode=None,
                      interpret=False):
    """Tile energy from the six dot outputs + small per-tile slices.

    w_list:  6 arrays (T, T, o, T, o, o), layout (x, y, i', z, j', k')
    vooo_t:  (3, T, o*o, o)     [(i,j), m] blocks at the three tile starts
    t2p:     (3, 3, T, T, o, o) t2 pair blocks [m/j, k] for every role pair
    oovv_t:  (3, 3, T, T, o, o) (ix|jy) blocks
    t1_t:    (3, T, 1, o), fvo_t: (3, T, 1, o), eijk: (o, o, o)
    gabc:    (3, T) int32 global virtual indices; evt: (3, T) energies
    """
    T = w_list[0].shape[0]
    o = w_list[0].shape[2]
    dtype = w_list[0].dtype

    def wspec(p):
        return pl.BlockSpec(
            (None, None, o, None, o, o),
            lambda A, B, C, p=p: ((A, B, C)[p[0]], (A, B, C)[p[1]], 0,
                                  (A, B, C)[p[2]], 0, 0),
            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda A, B, C: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vooo_specs = [pl.BlockSpec((None, None, o * o, o),
                               lambda A, B, C, r=r: (r, (A, B, C)[r], 0, 0),
                               memory_space=pltpu.VMEM) for r in range(3)]
    pair_specs = [pl.BlockSpec(
        (None, None, None, None, o, o),
        lambda A, B, C, r1=r1, r2=r2: (r1, r2, (A, B, C)[r1],
                                       (A, B, C)[r2], 0, 0),
        memory_space=pltpu.VMEM) for (r1, r2) in PAIRS]
    occ_specs = [pl.BlockSpec((None, None, 1, o),
                              lambda A, B, C, r=r: (r, (A, B, C)[r], 0, 0),
                              memory_space=pltpu.VMEM) for r in range(3)]

    oovv_pair_specs = [pl.BlockSpec(
        (None, None, None, None, o, o),
        lambda A, B, C, r1=r1, r2=r2: (r1, r2, (A, B, C)[r1],
                                       (A, B, C)[r2], 0, 0),
        memory_space=pltpu.VMEM) for (r1, r2) in PAIRS]

    in_specs = ([smem, smem, smem]
                + [wspec(p) for p in PERMS]
                + vooo_specs + pair_specs + oovv_pair_specs
                + occ_specs + occ_specs
                + [full((o, o, o)), full((o, o, o))])
    if actv is None:
        actv = jnp.zeros((3, T), dtype)
        actocc = jnp.zeros((o, o, o), dtype)

    kernel = partial(_kernel_entry, o, T, act_mode, dtype)
    out = pl.pallas_call(
        kernel,
        grid=(T, T, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        interpret=interpret,
    )(gabc, evt, actv, *w_list,
      vooo_t, vooo_t, vooo_t,
      t2p, t2p, t2p, t2p, t2p, t2p,
      oovv_t, oovv_t, oovv_t, oovv_t, oovv_t, oovv_t,
      t1_t, t1_t, t1_t, fvo_t, fvo_t, fvo_t,
      eijk, actocc)
    return out[0, 0]
