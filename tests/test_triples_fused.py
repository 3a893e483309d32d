"""Engine equivalence for the (T) permutation-epilogue Pallas kernel.

The production TPU path runs ops/triples_combine.py (engine='fused');
CI is CPU-only, where the kernel executes in Pallas interpret mode.
This locks the fused path — BlockSpec index maps, canonical-emission
dot layouts, batched in-kernel w2 dots, weights — against the pure-XLA
engine on the same inputs (reference spec: the add_and_permute/energy
contraction of pyscf/lib/cc/ccsd_t.c:39-230)."""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import ccsd_t


def _rand_problem(nocc=3, nvir=7, seed=7):
    rng = np.random.default_rng(seed)

    def r(*shape):
        return rng.standard_normal(shape) * 0.05

    t1 = r(nocc, nvir)
    t2 = r(nocc, nocc, nvir, nvir)
    t2 = t2 + t2.transpose(1, 0, 3, 2)
    ovov = r(nocc, nvir, nocc, nvir)
    ovov = ovov + ovov.transpose(2, 3, 0, 1)
    ovvv = r(nocc, nvir, nvir, nvir)
    ovvv = ovvv + ovvv.transpose(0, 1, 3, 2)
    ovoo = r(nocc, nvir, nocc, nocc)
    ovoo = ovoo + ovoo.transpose(0, 1, 3, 2)
    mo_energy = np.concatenate([-np.sort(rng.random(nocc))[::-1] - 1.0,
                                np.sort(rng.random(nvir)) + 0.5])
    fock = np.diag(mo_energy)
    fock += 0.01 * (r(nocc + nvir, nocc + nvir)
                    + r(nocc + nvir, nocc + nvir).T)
    eris = SimpleNamespace(
        fock=jnp.asarray(fock), mo_energy=jnp.asarray(mo_energy),
        ovoo=jnp.asarray(ovoo), ovov=jnp.asarray(ovov),
        ovvv=jnp.asarray(ovvv), Lov=None, Lvv=None)
    return jnp.asarray(t1), jnp.asarray(t2), eris


def test_fused_engine_matches_xla_engine():
    t1, t2, eris = _rand_problem()
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla"))
    e_fused = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="fused"))
    assert abs(e_xla) > 1e-8  # non-degenerate problem
    np.testing.assert_allclose(e_fused, e_xla, rtol=1e-10, atol=1e-12)


def test_fused_engine_active_mask_matches_xla():
    t1, t2, eris = _rand_problem(seed=11)
    kw = dict(act_hole=[0, 2], act_particle=[1, 3, 4], mode="only_active")
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla", **kw))
    e_fused = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="fused", **kw))
    np.testing.assert_allclose(e_fused, e_xla, rtol=1e-10, atol=1e-12)


def test_chunked_grid_matches_per_tile():
    # grid-batched path (one pallas_call per K-tile chunk, grid (K,T,T))
    # vs the per-tile path (chunk=1): identical tiles, identical values.
    # tile=3/nvir=7 gives 10 tiles, so chunk=8 also exercises the
    # pad-to-chunk-multiple remainder masking.
    t1, t2, eris = _rand_problem(seed=3)
    e_1 = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="fused",
                              chunk=1))
    for K in (2, 4, 8):
        e_k = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="fused",
                                  chunk=K))
        np.testing.assert_allclose(e_k, e_1, rtol=1e-12, atol=1e-13)


def test_chunked_grid_active_mask_matches_xla():
    t1, t2, eris = _rand_problem(seed=11)
    for m in ("only_active", "exclude_active"):
        kw = dict(act_hole=[0, 2], act_particle=[1, 3, 4], mode=m)
        e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla",
                                    **kw))
        e_k = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="fused",
                                  chunk=4, **kw))
        np.testing.assert_allclose(e_k, e_xla, rtol=1e-10, atol=1e-12)


def test_chunked_grid_tiles_per_call_slabs():
    # multiple jit slabs (tiles_per_call < ntiles*K) must agree with one
    t1, t2, eris = _rand_problem(seed=5)
    e_one = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="fused",
                                chunk=4))
    e_slab = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="fused",
                                 chunk=4, tiles_per_call=4))
    np.testing.assert_allclose(e_slab, e_one, rtol=1e-12, atol=1e-13)


def _df_problem(nocc=3, nvir=7, naux=11, seed=13):
    rng = np.random.default_rng(seed)
    t1, t2, eris = _rand_problem(nocc, nvir, seed)
    Lov = rng.standard_normal((naux, nocc, nvir)) * 0.1
    Lvv = rng.standard_normal((naux, nvir, nvir)) * 0.1
    Lvv = 0.5 * (Lvv + Lvv.transpose(0, 2, 1))
    eris.ovvv = None
    eris.Lov = jnp.asarray(Lov)
    eris.Lvv = jnp.asarray(Lvv)
    return t1, t2, eris


def test_resident_engine_matches_xla_engine():
    # resident engine (in-kernel W dots, interpret mode on CPU) vs the
    # pure-XLA engine, exact at 'f32' mode (plain fp64 dots under x64)
    t1, t2, eris = _rand_problem()
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla"))
    e_res = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="resident",
                                dot_precision="highest"))
    np.testing.assert_allclose(e_res, e_xla, rtol=1e-10, atol=1e-12)


def test_resident_engine_df_matches_xla_engine():
    t1, t2, eris = _df_problem()
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla"))
    e_res = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="resident",
                                dot_precision="highest"))
    np.testing.assert_allclose(e_res, e_xla, rtol=1e-10, atol=1e-12)


def test_resident_engine_active_mask_matches_xla():
    t1, t2, eris = _rand_problem(seed=11)
    for m in ("only_active", "exclude_active"):
        kw = dict(act_hole=[0, 2], act_particle=[1, 3, 4], mode=m)
        e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla",
                                    **kw))
        e_res = float(ccsd_t.kernel(t1, t2, eris, tile=3,
                                    engine="resident",
                                    dot_precision="highest", **kw))
        np.testing.assert_allclose(e_res, e_xla, rtol=1e-10, atol=1e-12)


def test_resident_split_mode_tracks_bf16x3():
    # 'split' (manual hi/lo bf16x3) must agree with the exact value to
    # bf16x3-class accuracy — loose bound, catches wiring errors only
    t1, t2, eris = _rand_problem(seed=2)
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla"))
    e_res = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="resident",
                                dot_precision="high"))
    np.testing.assert_allclose(e_res, e_xla, rtol=5e-4)


def test_resident_odd_tile_padding():
    # nvir=7 with tile=4 -> padded virtuals exercise the weight-zero and
    # 1e6-denominator padding in the resident prep
    t1, t2, eris = _rand_problem(seed=9)
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=4, engine="xla"))
    e_res = float(ccsd_t.kernel(t1, t2, eris, tile=4, engine="resident",
                                dot_precision="highest"))
    np.testing.assert_allclose(e_res, e_xla, rtol=1e-10, atol=1e-12)


def test_retired_engines_rejected():
    t1, t2, eris = _rand_problem()
    import pytest
    for name in ("fused2", "fused3", "fused4"):
        with pytest.raises(ValueError):
            ccsd_t.kernel(t1, t2, eris, tile=3, engine=name)


# ---------------------------------------------------------------- flat
# round-5 engine: unpadded W streams (the 6D forms store/stream 4.0x
# lane-padded at production occupancy); emission transposes replace all
# in-kernel occupied swaps

def test_flat_engine_matches_xla_engine():
    t1, t2, eris = _rand_problem()
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla"))
    e_flat = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="flat",
                                 chunk=1))
    assert abs(e_xla) > 1e-8
    np.testing.assert_allclose(e_flat, e_xla, rtol=1e-10, atol=1e-12)


def test_flat_chunked_matches_xla_engine():
    t1, t2, eris = _rand_problem(seed=13)
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla"))
    e_flat = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="flat",
                                 chunk=4))
    np.testing.assert_allclose(e_flat, e_xla, rtol=1e-10, atol=1e-12)


def test_flat_engine_active_mask_matches_xla():
    t1, t2, eris = _rand_problem(seed=11)
    kw = dict(act_hole=[0, 2], act_particle=[1, 3, 4], mode="only_active")
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="xla", **kw))
    e_flat = float(ccsd_t.kernel(t1, t2, eris, tile=3, engine="flat",
                                 chunk=2, **kw))
    np.testing.assert_allclose(e_flat, e_xla, rtol=1e-10, atol=1e-12)


def test_flat_engine_df_mesh_matches_xla():
    import __graft_entry__ as ge
    from pyscf_mpcc_tpu.parallel import make_mesh
    eris = ge._synthetic_eris(nocc=6, nvir=10, naux=24, dtype=jnp.float64,
                              build_ovvv=False)
    rng = np.random.default_rng(5)
    t1 = jnp.asarray(rng.standard_normal((6, 10)) * 0.05)
    t2 = rng.standard_normal((6, 6, 10, 10)) * 0.05
    t2 = jnp.asarray(t2 + t2.transpose(1, 0, 3, 2))
    e_xla = float(ccsd_t.kernel(t1, t2, eris, tile=4, engine="xla"))
    e_mesh = float(ccsd_t.kernel(t1, t2, eris, tile=4, engine="flat",
                                 mesh=make_mesh(8)))
    np.testing.assert_allclose(e_mesh, e_xla, rtol=1e-10, atol=1e-12)
