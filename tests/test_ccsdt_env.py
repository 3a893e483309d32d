"""DF-scale environment (inactive) iterative triples (cc/ccsdt_env.py)
vs the spin-orbital oracle (gccsdt_slow.env_triples_kernel).

The decisive checks: converged env t3 and the adjoint energy match the
oracle's full-space evaluation on closed-shell (H2O) and open-shell (O2)
references, for a Fock-only ('ccsdt-1') and a coupled ('ccsdt-3')
model, with both energy-pairing conventions."""

import numpy as np
import pytest

from pyscf_mpcc_tpu.cc import ccsdt_act, ccsdt_env, gccsd_slow, gccsdt_slow

from tests.test_ccsdt_act import _setup, _split1, _split2


def _so_acts(d, ah, ap):
    """Per-spin active tuples -> the oracle's flat spin-orbital lists
    (occupied order [occ_a, occ_b], virtual order [vir_a, vir_b])."""
    na, va = d["na"], d["va"]
    ah_so = list(np.asarray(ah[0], int)) + [na + int(i) for i in ah[1]]
    ap_so = list(np.asarray(ap[0], int)) + [va + int(i) for i in ap[1]]
    return ah_so, ap_so


def _full_sig_ix(sig, d):
    """np.ix_ selecting a canonical-signature FULL-range block out of a
    spin-orbital 6-index array."""
    na, va = d["na"], d["va"]
    nb, vb = d["nb"], d["vb"]
    hole = {"a": np.arange(na), "b": na + np.arange(nb)}
    part = {"a": np.arange(va), "b": va + np.arange(vb)}
    return np.ix_(*[hole[c] for c in sig[:3]], *[part[c] for c in sig[3:]])


@pytest.mark.parametrize("which,model", [("h2o", "ccsdt-1"),
                                         ("h2o", "ccsdt-3"),
                                         ("o2", "ccsdt-3")])
def test_env_solver_matches_oracle(which, model):
    s = _setup(which)
    mf, d = s["mf"], s["dims"]
    ah, ap = s["act_hole"], s["act_particle"]
    so, h_so = s["so"], s["h_so"]
    nocc = (d["na"], d["nb"])

    # converged GCCSD amplitudes as the fixed (t1, t2)
    e, t1_so, t2_so, conv = gccsd_slow.kernel(so, conv_tol=1e-11,
                                              conv_tol_normt=1e-9)
    assert conv

    ah_so, ap_so = _so_acts(d, ah, ap)
    e_o, t3_o, conv_o = gccsdt_slow.env_triples_kernel(
        so, h_so, t1_so, t2_so, ah_so, ap_so, model=model, max_cycle=80,
        conv_tol=1e-10)
    assert conv_o

    t1 = _split1(t1_so, d)
    t2 = _split2(t2_so, d)
    e_p, t3_p, conv_p = ccsdt_env.kernel(
        s["B"], s["h"], t1, t2, nocc, ah, ap, s["mo_energy"],
        model=model, max_cycle=80, conv_tol=1e-10)
    assert conv_p
    assert abs(e_p - e_o) < 1e-9

    for sig in ccsdt_act.T3_CANONICAL:
        want = t3_o[_full_sig_ix(sig, d)]
        assert np.abs(np.asarray(t3_p[sig]) - want).max() < 1e-8, sig


def test_env_energy_inactive_amplitude_convention():
    """env_amplitudes=True (fork inactive_energy) zeroes the active
    amplitude blocks in the pairing; both conventions must match the
    oracle's."""
    s = _setup("h2o")
    d = s["dims"]
    ah, ap = s["act_hole"], s["act_particle"]
    so, h_so = s["so"], s["h_so"]
    nocc = (d["na"], d["nb"])
    e, t1_so, t2_so, conv = gccsd_slow.kernel(so, conv_tol=1e-11,
                                              conv_tol_normt=1e-9)
    assert conv
    ah_so, ap_so = _so_acts(d, ah, ap)
    e_o, t3_o, conv_o = gccsdt_slow.env_triples_kernel(
        so, h_so, t1_so, t2_so, ah_so, ap_so, model="ccsdt-1",
        max_cycle=80, conv_tol=1e-10, env_amplitudes=True)
    assert conv_o
    t1 = _split1(t1_so, d)
    t2 = _split2(t2_so, d)
    e_p, _, conv_p = ccsdt_env.kernel(
        s["B"], s["h"], t1, t2, nocc, ah, ap, s["mo_energy"],
        model="ccsdt-1", max_cycle=80, conv_tol=1e-10,
        env_amplitudes=True)
    assert conv_p
    assert abs(e_p - e_o) < 1e-9


def test_seeded_active_block_couples_and_is_excluded_from_energy():
    """Seeding a fixed active t3 (fork iterative_kernel convention)
    changes the env solution through the off-diagonal couplings, while
    the energy still pairs only the environment part."""
    s = _setup("h2o")
    d = s["dims"]
    ah, ap = s["act_hole"], s["act_particle"]
    so = s["so"]
    nocc = (d["na"], d["nb"])
    e, t1_so, t2_so, conv = gccsd_slow.kernel(so, conv_tol=1e-11,
                                              conv_tol_normt=1e-9)
    assert conv
    t1 = _split1(t1_so, d)
    t2 = _split2(t2_so, d)
    arrs = ccsdt_act.dress_df(s["B"], s["h"], t1, nocc)
    nmo = (s["B"][0].shape[1], s["B"][1].shape[1])

    # a small synthetic active t3 block (antisymmetry not required for
    # the coupling/energy plumbing check; use a symmetric-safe seed)
    rng = np.random.default_rng(7)
    seed = {}
    for sig in ccsdt_act.T3_CANONICAL:
        sp = ["ab".index(c) for c in sig]
        shape = tuple(len(ah[p]) for p in sp[:3]) + tuple(
            len(ap[p]) for p in sp[3:])
        seed[sig] = 1e-3 * rng.standard_normal(shape)

    t3_0, c0 = ccsdt_env.solve_t3_env(
        t2, nocc, nmo, ah, ap, arrs, s["mo_energy"], model="ccsdt-3",
        max_cycle=80, conv_tol=1e-10)
    t3_s, cs = ccsdt_env.solve_t3_env(
        t2, nocc, nmo, ah, ap, arrs, s["mo_energy"], model="ccsdt-3",
        max_cycle=80, conv_tol=1e-10, t3_act=seed)
    assert c0 and cs
    masks = ccsdt_env.env_masks(nocc, nmo, ah, ap)
    diff = max(np.abs((np.asarray(t3_s[k]) - np.asarray(t3_0[k]))
                      * masks[k]).max() for k in ccsdt_act.T3_CANONICAL)
    assert diff > 1e-10      # the seed couples into the environment

    # active slot holds the seed exactly
    for sig in ccsdt_act.T3_CANONICAL:
        sp = ["ab".index(c) for c in sig]
        idx = np.ix_(*[np.asarray(ah[p], int) for p in sp[:3]],
                     *[np.asarray(ap[p], int) for p in sp[3:]])
        assert np.abs(np.asarray(t3_s[sig])[idx] - seed[sig]).max() < 1e-12

    # energy ignores the active slot: zeroing it changes nothing
    e_s = ccsdt_env.env_energy(t3_s, nocc, nmo, ah, ap, arrs, t1, t2)
    t3_z = {k: np.asarray(v) * masks[k] for k, v in t3_s.items()}
    e_z = ccsdt_env.env_energy(t3_z, nocc, nmo, ah, ap, arrs, t1, t2)
    assert abs(e_s - e_z) < 1e-12
