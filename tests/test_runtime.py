"""Runtime-library features: config, StreamObject, memory governor,
DIIS spill/restore + driver restart."""

import os

import numpy as np
import pytest

from pyscf_mpcc_tpu import config, gto
from pyscf_mpcc_tpu.lib.diis import DIIS
from pyscf_mpcc_tpu.lib import memory
from pyscf_mpcc_tpu.scf import RHF


def test_config_defaults_and_getattr():
    assert config.getattr_cfg("CC_CONV_TOL") == config.CC_CONV_TOL
    assert config.getattr_cfg("NOT_A_KEY", 42) == 42


def test_stream_object_set_run_check_sanity():
    mol = gto.M(atom="H 0 0 0; H 0 0 0.74", basis="sto-3g",
                unit="angstrom")
    mf = RHF(mol)
    mf.kernel()
    from pyscf_mpcc_tpu.cc.driver import CCSD
    cc = CCSD(mf).set(conv_tol=1e-9, max_cycle=40)
    assert cc.conv_tol == 1e-9
    cc.run()
    assert cc.converged
    cc.check_sanity()          # no unknown attributes -> no warning
    cc.fish = 1
    with pytest.warns(UserWarning, match="fish"):
        cc.check_sanity()


def test_memory_governor_plans():
    nt = memory.plan_ladder_ntile(32, 424, 1216, budget=14 * 2**30)
    tsz = -(-424 // nt)
    # the 4-index dressed pair block the ladder actually materializes must
    # fit the budget with room for its double buffer (regression: a 3-index
    # model chose ntile=8 -> a 19.5 GB allocation rejected on-device); the
    # pair-tiled ladder zero-pads, so divisibility is NOT required, but
    # tiles must stay MXU-friendly
    assert tsz * tsz * 424 ** 2 * 4 * 2 < 14 * 2**30 // 2
    assert tsz >= 16
    tiny = memory.plan_ladder_ntile(8, 64, 128, budget=14 * 2**30)
    assert tiny == 1           # everything fits in one tile
    # the Lambda/RDM backward sweep holds the rematerialized W block AND
    # its cotangent live (plus extra t2-sized cotangents persistent), so
    # the vjp plan must never be coarser than the forward plan
    nt_vjp = memory.plan_ladder_ntile(32, 424, 1216, budget=14 * 2**30,
                                      vjp=True)
    assert nt_vjp >= nt
    tsz_vjp = -(-424 // nt_vjp)
    assert tsz_vjp * tsz_vjp * 424 ** 2 * 4 * 4 < 14 * 2**30 // 2
    t = memory.plan_triples_tile(32, 424, 1216, budget=14 * 2**30)
    assert 4 <= t <= 16 and t % 2 == 0
    # a tight budget must shrink the tile
    t_small = memory.plan_triples_tile(32, 424, 1216, budget=4 * 2**30)
    assert t_small <= t


def test_diis_dump_restore_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = DIIS(space=4)
    seq = [rng.standard_normal(10) for _ in range(5)]
    outs = [d.update(v) for v in seq]
    p = str(tmp_path / "ring.npz")
    d.dump(p)
    d2 = DIIS.restore(p)
    nxt = rng.standard_normal(10)
    ref = d.update(nxt.copy())
    got = d2.update(nxt.copy())
    np.testing.assert_allclose(got, ref, atol=1e-14)


def test_ccsd_restart_from_diis_file(tmp_path):
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    from pyscf_mpcc_tpu.cc.driver import CCSD
    ref = CCSD(mf).set(conv_tol=1e-11, conv_tol_normt=1e-9).run()

    p = str(tmp_path / "ccsd_diis.npz")
    interrupted = CCSD(mf).set(conv_tol=1e-11, conv_tol_normt=1e-9)
    interrupted.diis_file = p
    interrupted.max_cycle = 5            # "preempted" early
    interrupted.kernel()
    assert not interrupted.converged
    assert os.path.exists(p)

    resumed = CCSD(mf).set(conv_tol=1e-11,
                           conv_tol_normt=1e-9).restore_from_diis_(p)
    resumed.kernel()
    assert resumed.converged
    assert abs(resumed.e_corr - ref.e_corr) < 1e-9


def test_lambda_restart_from_diis_file(tmp_path):
    # Lambda solves get the same preemption-safety contract as CCSD:
    # spill the host DIIS ring every cycle, resume from it, converge to
    # the uninterrupted multipliers (production (H2O)8 protocol).
    from pyscf_mpcc_tpu.cc import eris as eris_mod
    from pyscf_mpcc_tpu.cc import lambda_ad, rccsd

    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    er = eris_mod.make_eris_incore(
        gto.intor_eri(mol), mf.mo_coeff, mf.get_fock(mf.make_rdm1()),
        mol.nelectron // 2)
    _, _, t1, t2 = rccsd.kernel(er, conv_tol=1e-11, conv_tol_normt=1e-9)
    _, l1_ref, l2_ref = lambda_ad.kernel(t1, t2, er, conv_tol=1e-10)

    p = str(tmp_path / "lambda_diis.npz")
    cl, _, _ = lambda_ad.kernel(t1, t2, er, conv_tol=1e-10, max_cycle=3,
                                diis_file=p)
    assert not cl and os.path.exists(p)
    cl, l1, l2 = lambda_ad.kernel(t1, t2, er, conv_tol=1e-10,
                                  adiis=DIIS.restore(p), diis_file=p)
    assert cl
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l1_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l2_ref),
                               atol=1e-8)


def test_persistent_compilation_cache(tmp_path):
    # The persistent XLA cache (lib/compile_cache.py) must land compiled
    # executables on disk so repeat processes (scanners, fragment loops,
    # restarts) start warm.  Run the same tiny jitted program in two
    # fresh subprocesses sharing a cache dir: the first populates it, the
    # second must hit it (jax logs a cache read at DEBUG, but the
    # contract we pin is entries-on-disk + idempotent enable).
    import subprocess
    import sys

    d = str(tmp_path / "xla_cache")
    code = (
        "from pyscf_mpcc_tpu.lib.compile_cache import "
        "enable_compilation_cache\n"
        "import jax, jax.numpy as jnp\n"
        "p1 = enable_compilation_cache(min_compile_secs=0.0)\n"
        "p2 = enable_compilation_cache(min_compile_secs=0.0)\n"
        "assert p1 == p2, (p1, p2)\n"
        "x = jnp.ones((128, 128))\n"
        "print(float(jax.jit(lambda a: (a @ a).sum())(x)))\n"
    )
    from conftest import clean_child_env
    env = clean_child_env(PYSCF_MPCC_TPU_COMPILATION_CACHE_DIR=d)
    for _ in range(2):
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
    assert os.path.isdir(d) and len(os.listdir(d)) >= 1
    # disabled when the config path is empty
    from pyscf_mpcc_tpu.lib.compile_cache import enable_compilation_cache
    assert enable_compilation_cache("") is None
