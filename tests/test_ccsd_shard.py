"""shard_map-tiled RCCSD update (parallel/ccsd_shard) vs the unsharded
oracle on the 8-virtual-device CPU mesh.

The tiled update re-derives every contraction on occupied-row shards
(rings / psums / all_to_all exchanges); these tests pin it against
cc/rccsd.update_amps term-for-term at fp64, where any mis-localized
index shows up far above the 1e-10 gate."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from pyscf_mpcc_tpu.cc import rccsd
from pyscf_mpcc_tpu.parallel import make_mesh
from pyscf_mpcc_tpu.parallel import ccsd_shard


def _setup(nocc=8, nvir=16, naux=24):
    eris = ge._synthetic_eris(nocc=nocc, nvir=nvir, naux=naux,
                              dtype=jnp.float64, build_ovvv=False)
    # random NONZERO t1 (the synthetic fock is diagonal, so init_amps
    # gives t1 = 0 and every t1 pathway would go untested) and a t2 with
    # the physical (ij)(ab) swap symmetry
    rng = np.random.RandomState(7)
    t1 = jnp.asarray(rng.randn(nocc, nvir) * 0.05)
    t2 = jnp.asarray(rng.randn(nocc, nocc, nvir, nvir) * 0.05)
    t2 = 0.5 * (t2 + t2.transpose(1, 0, 3, 2))
    return eris, t1, t2


def test_t_exchange_roundtrip():
    mesh = make_mesh(8, axis_name="dp")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 8, 6, 6))
    from jax.sharding import NamedSharding, PartitionSpec as P
    from functools import partial
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:
        from jax.shard_map import shard_map
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    import inspect
    ck = ("check_vma" if "check_vma"
          in inspect.signature(shard_map).parameters else "check_rep")
    fn = jax.jit(shard_map(
        partial(ccsd_shard._t_exchange, axis="dp", N=8),
        mesh=mesh, in_specs=P("dp"), out_specs=P("dp"), **{ck: False}))
    y = np.asarray(fn(xs))
    ref = np.asarray(x).transpose(1, 0, 3, 2)
    assert np.abs(y - ref).max() == 0.0


def test_tiled_update_matches_unsharded():
    eris, t1, t2 = _setup()
    ref1, ref2 = rccsd.update_amps(t1, t2, eris, ntile=2)
    mesh = make_mesh(8, axis_name="dp")
    eris_s = ccsd_shard.shard_eris_tiled(eris, mesh)
    t1s, t2s = ccsd_shard.shard_amps_tiled(t1, t2, mesh)
    o1, o2 = ccsd_shard.update_amps_tiled(t1s, t2s, eris_s, mesh,
                                          ntile=4, nchunk=2)
    r1 = np.abs(np.asarray(o1) - np.asarray(ref1)).max()
    r2 = np.abs(np.asarray(o2) - np.asarray(ref2)).max()
    assert r1 < 1e-11, r1
    assert r2 < 1e-11, r2


def test_tiled_update_asymmetric_shapes():
    # nvir not divisible by the ladder tiling; naux not divisible by N
    eris, t1, t2 = _setup(nocc=8, nvir=14, naux=27)
    ref1, ref2 = rccsd.update_amps(t1, t2, eris, ntile=3)
    mesh = make_mesh(8, axis_name="dp")
    eris_s = ccsd_shard.shard_eris_tiled(eris, mesh)
    t1s, t2s = ccsd_shard.shard_amps_tiled(t1, t2, mesh)
    o1, o2 = ccsd_shard.update_amps_tiled(t1s, t2s, eris_s, mesh,
                                          ntile=3, nchunk=3)
    assert np.abs(np.asarray(o1) - np.asarray(ref1)).max() < 1e-11
    assert np.abs(np.asarray(o2) - np.asarray(ref2)).max() < 1e-11


def test_tiled_kernel_converges_to_unsharded_energy():
    eris, _, _ = _setup()
    conv_ref, e_ref, _, _ = rccsd.kernel(eris, conv_tol=1e-10,
                                         conv_tol_normt=1e-8)
    assert conv_ref
    mesh = make_mesh(8, axis_name="dp")
    eris_s = ccsd_shard.shard_eris_tiled(eris, mesh)
    conv, e, _, _ = ccsd_shard.kernel_tiled(eris_s, mesh, conv_tol=1e-10,
                                            conv_tol_normt=1e-8,
                                            ntile=2, nchunk=2)
    assert conv
    assert abs(e - e_ref) < 1e-9


def test_tiled_update_on_submesh():
    # 4 of 8 devices; nocc=8 divides 4
    eris, t1, t2 = _setup(nocc=8, nvir=12, naux=16)
    ref1, ref2 = rccsd.update_amps(t1, t2, eris, ntile=1)
    mesh = make_mesh(4, axis_name="dp")
    eris_s = ccsd_shard.shard_eris_tiled(eris, mesh)
    t1s, t2s = ccsd_shard.shard_amps_tiled(t1, t2, mesh)
    o1, o2 = ccsd_shard.update_amps_tiled(t1s, t2s, eris_s, mesh,
                                          ntile=2, nchunk=1)
    assert np.abs(np.asarray(o1) - np.asarray(ref1)).max() < 1e-11
    assert np.abs(np.asarray(o2) - np.asarray(ref2)).max() < 1e-11
