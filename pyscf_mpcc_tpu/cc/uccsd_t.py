"""Fast open-shell UCCSD(T) — tiled spin-orbital triples on TPU.

TPU-native counterpart of the reference's four-channel C engine
(pyscf/lib/cc/uccsd_t.c:278 CCuccsd_t_aaa, :532 CCuccsd_t_baa, driver
pyscf/cc/uccsd_t.py:30).  Instead of hand-specialized aaa/bbb/baa/bba
channels (a CPU cache-blocking artifact), the kernel works in the
*antisymmetrized spin-orbital* formulation over the combined
[occ_a, occ_b] x [vir_a, vir_b] index space:

    W_ijk^abc = P(i/jk) P(a/bc) [ sum_e t2_jk^ae <ei||bc>
                                  - sum_m t2_im^bc <ma||jk> ]
    E(T) = (1/6) sum_{a>b>c} sum_{ijk} W (W + V) / D_ijk^abc

evaluated as a lax.scan over (ta >= tb >= tc) tiles of the virtual-triple
space — the architecture of the closed-shell engine (cc/ccsd_t.py).  Every
spin case is covered by the one dense kernel; spin-forbidden blocks vanish
because the assembled spin-orbital tensors are block-diagonal in spin.
Per tile: three primitive evaluations (one per P(a/bc) term; the hole
symmetrizer P(i/jk) is a pure transpose since the occupied axes are whole)
with the <ei||bc> blocks reconstructed on the fly from per-spin DF factors
(no O(o v^3) spin-orbital ovvv storage), and fp64 tile-energy accumulation.

The disconnected V term uses the canonical-orbital form (t1 * <jk||bc>),
matching the in-repo oracle cc/gccsd_t_slow.py which this kernel is
validated against.

Active-space masks (act_hole/act_particle as spin pairs) restrict the
energy sum exactly as the closed-shell kernel's 'exclude_active' /
'only_active' modes — the open-shell side of the fork's environment
triples partition (pyscf/cc/uccsd_t_inactive_iterative.py:45-51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc.ccsd_t import _SCAN_CACHE, _tile_triples


def _so_chem_ooov(eris, dtype):
    """Spin-orbital chemists' (oo|ov): soc[j,m,k,x] = (j m|k x)."""
    na, nb = eris.nocca, eris.noccb
    va = eris.ovov.shape[1]
    vb = eris.OVOV.shape[1]
    O, V = na + nb, va + vb
    out = np.zeros((O, O, O, V), dtype=np.asarray(eris.ovoo).dtype)
    # (oo|ov) is the (2,3,0,1)-transpose of the stored (ov|oo) blocks
    out[:na, :na, :na, :va] = np.asarray(eris.ovoo).transpose(2, 3, 0, 1)
    out[:na, :na, na:, va:] = np.asarray(eris.OVoo).transpose(2, 3, 0, 1)
    out[na:, na:, :na, :va] = np.asarray(eris.ovOO).transpose(2, 3, 0, 1)
    out[na:, na:, na:, va:] = np.asarray(eris.OVOO).transpose(2, 3, 0, 1)
    return jnp.asarray(out, dtype)


def _so_chem_ovov(eris, dtype):
    """Spin-orbital chemists' (ov|ov): soc[i,y,k,z] = (i y|k z)."""
    na, nb = eris.nocca, eris.noccb
    va = eris.ovov.shape[1]
    vb = eris.OVOV.shape[1]
    O, V = na + nb, va + vb
    out = np.zeros((O, V, O, V), dtype=np.asarray(eris.ovov).dtype)
    out[:na, :va, :na, :va] = np.asarray(eris.ovov)
    out[:na, :va, na:, va:] = np.asarray(eris.ovOV)
    out[na:, va:, :na, :va] = np.asarray(eris.ovOV).transpose(2, 3, 0, 1)
    out[na:, va:, na:, va:] = np.asarray(eris.OVOV)
    return jnp.asarray(out, dtype)


def _so_chem_ovvv(eris, dtype):
    """Spin-orbital chemists' (ov|vv): soc[i,z,e,y] = (i z|e y).

    Materialized fallback (test path); the DF path reconstructs tile
    blocks from Lov/Lvv instead."""
    na, nb = eris.nocca, eris.noccb
    va = eris.ovvv.shape[1]
    vb = eris.OVVV.shape[1]
    O, V = na + nb, va + vb
    out = np.zeros((O, V, V, V), dtype=np.asarray(eris.ovvv).dtype)
    out[:na, :va, :va, :va] = np.asarray(eris.ovvv)
    out[:na, :va, va:, va:] = np.asarray(eris.ovVV)
    out[na:, va:, :va, :va] = np.asarray(eris.OVvv)
    out[na:, va:, va:, va:] = np.asarray(eris.OVVV)
    return jnp.asarray(out, dtype)


def _so_df(eris, dtype):
    """Block-diagonal spin-orbital DF factors (naux, O, V)/(naux, V, V)."""
    na, nb = eris.nocca, eris.noccb
    Lov_a = np.asarray(eris.Lov_a)
    Lov_b = np.asarray(eris.Lov_b)
    Lvv_a = np.asarray(eris.Lvv_a)
    Lvv_b = np.asarray(eris.Lvv_b)
    naux = Lov_a.shape[0]
    va = Lov_a.shape[2]
    vb = Lov_b.shape[2]
    O, V = na + nb, va + vb
    Lov = np.zeros((naux, O, V), dtype=Lov_a.dtype)
    Lov[:, :na, :va] = Lov_a
    Lov[:, na:, va:] = Lov_b
    Lvv = np.zeros((naux, V, V), dtype=Lvv_a.dtype)
    Lvv[:, :va, :va] = Lvv_a
    Lvv[:, va:, va:] = Lvv_b
    return jnp.asarray(Lov, dtype), jnp.asarray(Lvv, dtype)


def kernel(t1, t2, eris, tile=8, dtype=None, tiles_per_call=2048,
           act_hole=None, act_particle=None, mode="exclude_active",
           mesh=None):
    """E(T) from converged unrestricted (t1, t2) and a UERIs container.

    t1 = (t1a, t1b), t2 = (t2aa, t2ab, t2bb).  Uses the per-spin DF
    factors when present (production), else the materialized three-virtual
    blocks.  act_hole/act_particle are (alpha, beta) index-array pairs.
    """
    from pyscf_mpcc_tpu.cc import uccsd

    na, nb = eris.nocca, eris.noccb
    va = t1[0].shape[1]
    vb = t1[1].shape[1]
    O, V = na + nb, va + vb
    if dtype is None:
        dtype = t2[1].dtype

    T1, T2 = uccsd.to_spin_orbital(t1, t2, (na, nb))
    ea = np.asarray(jnp.diagonal(eris.focka))
    eb = np.asarray(jnp.diagonal(eris.fockb))
    eo = jnp.asarray(np.concatenate([ea[:na], eb[:nb]]), dtype)
    ev = np.concatenate([ea[na:], eb[nb:]])

    # pad the spin-orbital virtual dimension to a tile multiple
    nvp = ((V + tile - 1) // tile) * tile
    pad = nvp - V

    def padv(x, axes):
        cfg = [(0, 0)] * x.ndim
        for ax in axes:
            cfg[ax] = (0, pad)
        return jnp.pad(x, cfg) if pad else x

    ev_p = jnp.asarray(np.concatenate([ev, np.full(pad, 1e6)]), dtype)
    t1p = padv(jnp.asarray(T1, dtype), [1])
    # t2T[a, e, (j,k)] = t2so[j,k,a,e]
    t2T = padv(jnp.asarray(T2, dtype).transpose(2, 3, 0, 1), [0, 1])
    t2T = t2T.reshape(nvp, nvp, O * O)
    # <jk||mx> = (jm|kx) - (jx|km), stored x-major for tile slicing:
    # nooo[x, m, (j,k)]
    soc = _so_chem_ooov(eris, dtype)
    aooov = soc.transpose(0, 2, 1, 3) - soc.transpose(2, 0, 1, 3)
    # aooov[j,k,m,x]; soc[j,m,k,x]: (jm|kx) -> [j,k,m,x] is (0,2,1,3);
    # (jx|km) = soc[k,m,j,x] -> [j,k,m,x] is (2,0,1,3)
    nooo = padv(aooov.transpose(3, 2, 0, 1), [0]).reshape(nvp, O, O * O)
    del soc, aooov
    # <jk||yz> = (jy|kz) - (jz|ky), minor (y,z) axes for tile slicing
    socv = _so_chem_ovov(eris, dtype)
    aoovv = socv.transpose(0, 2, 1, 3) - socv.transpose(0, 2, 3, 1)
    aoovv_r = padv(aoovv, [2, 3])
    del socv, aoovv

    if getattr(eris, "Lov_a", None) is not None:
        Lov, Lvv = _so_df(eris, dtype)
        Lov = padv(Lov, [2])
        Lvv = padv(Lvv, [1, 2])
        ovvv = None
    else:
        ovvv = padv(_so_chem_ovvv(eris, dtype), [1, 2, 3])
        Lov = Lvv = None

    trips = jnp.asarray(_tile_triples(nvp // tile))

    if act_hole is not None:
        (aha, ahb), (apa, apb) = act_hole, act_particle
        ao_m = np.zeros(O, dtype=bool)
        ao_m[np.asarray(aha, dtype=int)] = True
        ao_m[na + np.asarray(ahb, dtype=int)] = True
        av_m = np.zeros(nvp, dtype=bool)
        av_m[np.asarray(apa, dtype=int)] = True
        av_m[va + np.asarray(apb, dtype=int)] = True
        act_occ = jnp.asarray(ao_m, dtype)
        act_vir = jnp.asarray(av_m, dtype)
    else:
        act_occ = act_vir = None

    T = tile
    oo = O * O

    big = dict(t2T=t2T, nooo=nooo, aoovv_r=aoovv_r, t1p=t1p, ev_p=ev_p,
               eo=eo)
    if ovvv is not None:
        big["ovvv"] = ovvv
    else:
        big["Lov"] = Lov
        big["Lvv"] = Lvv
    if act_occ is not None:
        big["act_occ"] = act_occ
        big["act_vir"] = act_vir

    # P(a/bc): role maps over the (A, B, C) tile axes with signs
    pperms = [((0, 1, 2), 1.0), ((1, 0, 2), -1.0), ((2, 1, 0), -1.0)]

    def make_tile_energy(bg):
        t2T = bg["t2T"]
        nooo = bg["nooo"]
        aoovv_r = bg["aoovv_r"]
        t1p = bg["t1p"]
        ev_p = bg["ev_p"]
        eo = bg["eo"]
        ovvv = bg.get("ovvv")
        Lov = bg.get("Lov")
        Lvv = bg.get("Lvv")
        act_occ = bg.get("act_occ")
        act_vir = bg.get("act_vir")
        zi32 = jnp.int32(0)

        def g1_block(z0, y0):
            """G1[i, e, z, y] = <ie||zy> = (iz|ey) - (iy|ez)."""
            if ovvv is not None:
                d = jax.lax.dynamic_slice(ovvv, (zi32, z0, zi32, y0),
                                          (O, T, nvp, T))
                x = jax.lax.dynamic_slice(ovvv, (zi32, y0, zi32, z0),
                                          (O, T, nvp, T))
                return d.transpose(0, 2, 1, 3) - x.transpose(0, 2, 3, 1)
            lz = jax.lax.dynamic_slice(Lov, (zi32, zi32, z0),
                                       (Lov.shape[0], O, T))
            ly = jax.lax.dynamic_slice(Lov, (zi32, zi32, y0),
                                       (Lov.shape[0], O, T))
            vy = jax.lax.dynamic_slice(Lvv, (zi32, zi32, y0),
                                       (Lvv.shape[0], nvp, T))
            vz = jax.lax.dynamic_slice(Lvv, (zi32, zi32, z0),
                                       (Lvv.shape[0], nvp, T))
            d = jnp.einsum("Liz,Ley->iezy", lz, vy,
                           preferred_element_type=dtype)
            x = jnp.einsum("Liy,Lez->iezy", ly, vz,
                           preferred_element_type=dtype)
            return d - x

        def tile_energy(carry, abc):
            a0, b0, c0 = (jnp.int32(abc[0] * T), jnp.int32(abc[1] * T),
                          jnp.int32(abc[2] * T))
            starts = (a0, b0, c0)

            W = jnp.zeros((T, T, T, O, O, O), dtype)
            V6 = jnp.zeros((T, T, T, O, O, O), dtype)
            for p, sgn in pperms:
                xi, yi, zi = p
                # u1[x,y,z,i,(j,k)] = sum_e t2T[x,e,p] G1[i,e,z,y]
                t2x = jax.lax.dynamic_slice(t2T, (starts[xi], zi32, zi32),
                                            (T, nvp, oo))
                g1 = g1_block(starts[zi], starts[yi])
                u = jnp.einsum("xep,iezy->xyzip", t2x, g1,
                               preferred_element_type=dtype)
                u = u.reshape(T, T, T, O, O, O)
                # u2[x,y,z,i,j,k] = sum_m t2so[i,m,y,z] <jk||mx>
                # t2so[i,m,y,z] = t2T[y, z, (i,m)]
                t2yz = jax.lax.dynamic_slice(
                    t2T, (starts[yi], starts[zi], zi32), (T, T, oo)
                ).reshape(T, T, O, O)
                g2x = jax.lax.dynamic_slice(nooo, (starts[xi], zi32, zi32),
                                            (T, O, oo))
                u -= jnp.einsum("yzim,xmp->xyzip", t2yz, g2x,
                                preferred_element_type=dtype
                                ).reshape(T, T, T, O, O, O)
                # v[x,y,z,i,j,k] = t1[i,x] <jk||yz>
                t1x = jax.lax.dynamic_slice(t1p, (zi32, starts[xi]), (O, T))
                gyz = jax.lax.dynamic_slice(
                    aoovv_r, (zi32, zi32, starts[yi], starts[zi]),
                    (O, O, T, T))
                v = jnp.einsum("ix,jkyz->xyzijk", t1x, gyz)
                inv = [p.index(0), p.index(1), p.index(2)]
                W = W + sgn * jnp.transpose(u, tuple(inv) + (3, 4, 5))
                V6 = V6 + sgn * jnp.transpose(v, tuple(inv) + (3, 4, 5))

            # P(i/jk) on the whole occupied axes: pure transposes
            def hole_asym(x):
                return (x - x.transpose(0, 1, 2, 4, 3, 5)
                        - x.transpose(0, 1, 2, 5, 4, 3))

            W = hole_asym(W)
            V6 = hole_asym(V6)

            av = jax.lax.dynamic_slice(ev_p, (a0,), (T,))
            bv = jax.lax.dynamic_slice(ev_p, (b0,), (T,))
            cv = jax.lax.dynamic_slice(ev_p, (c0,), (T,))
            eabc = (av[:, None, None] + bv[None, :, None]
                    + cv[None, None, :])
            eijk = (eo[:, None, None] + eo[None, :, None]
                    + eo[None, None, :])
            denom = eijk[None, None, None] - eabc[:, :, :, None, None, None]

            # strict a > b > c on global indices (W vanishes on repeats;
            # masking keeps padded/fp-noise terms out exactly)
            ga = a0 + jnp.arange(T)
            gb = b0 + jnp.arange(T)
            gc = c0 + jnp.arange(T)
            wgt = ((ga[:, None, None] > gb[None, :, None])
                   & (gb[None, :, None] > gc[None, None, :])).astype(dtype)

            zd = (W + V6) / denom
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
                zd = zd * ((1.0 - act6) if mode == "exclude_active"
                           else act6)
            e_tile = jnp.einsum("xyzijk,xyzijk->xyz", W, zd)
            e = jnp.sum((e_tile * wgt).astype(carry.dtype))
            return carry + e, e

        return tile_energy

    acc_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        ndev = mesh.devices.size
        ntrips = trips.shape[0]
        npad = (-ntrips) % ndev
        trips_p = (jnp.concatenate([trips, jnp.tile(trips[:1], (npad, 1))])
                   if npad else trips)
        axis = mesh.axis_names[0]

        def _scan_shard(tt, bg):
            init = jax.lax.pvary(jnp.zeros((), dtype=acc_dtype), axis)
            e, _ = jax.lax.scan(make_tile_energy(bg), init, tt)
            return jax.lax.psum(e, axis)

        sharded = jax.jit(shard_map(_scan_shard, mesh=mesh,
                                    in_specs=(P(axis), P()), out_specs=P()))
        e_sum = float(sharded(trips_p, big))
        if npad:
            # the padded scan added npad extra copies of tile 0; remove them
            e0, _ = jax.lax.scan(make_tile_energy(big),
                                 jnp.zeros((), dtype=acc_dtype),
                                 jnp.tile(trips[:1], (npad, 1)))
            e_sum -= float(e0)
        return e_sum / 6.0

    cache_key = ("uccsd_t", tile, na, nb, va, vb, str(dtype),
                 str(acc_dtype), mode, act_hole is not None,
                 eris.Lov_a is None, jax.default_backend())
    scan_chunk = _SCAN_CACHE.get(cache_key)
    if scan_chunk is None:
        # jitting inside kernel() would re-trace per call (see
        # cc/ccsd_t.py _SCAN_CACHE note)
        scan_chunk = jax.jit(
            lambda c, t, bg: jax.lax.scan(make_tile_energy(bg), c, t)[1])
        _SCAN_CACHE[cache_key] = scan_chunk
    ntrips = trips.shape[0]
    total = 0.0
    p = 0
    while p < ntrips:
        n = min(tiles_per_call, ntrips - p)
        ys = scan_chunk(jnp.zeros((), dtype=acc_dtype),
                        jax.lax.slice(trips, (p, 0), (p + n, 3)), big)
        # fp64 host accumulation of the per-tile energies (the fp32
        # device carry random-walks at large tile counts)
        total += float(np.sum(np.asarray(ys, dtype=np.float64)))
        p += n
    return total / 6.0
