"""DF-scale active-space iterative T3 (cc/ccsdt_act.py) vs the
spin-orbital oracle (cc/gccsdt_slow.py).

The decisive checks: at identical (t1, t2, t3) the active-block T3
residual, the converged active t3, and the (R1, R2) feedback must match
the oracle's full-space evaluation sliced to the active blocks — for
both closed-shell (H2O) and open-shell (O2) references and for the
'ccsdt' and 'ccsdt-3' models."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import ccsdt_act, eom_slow, gccsd_slow, gccsdt_slow
from pyscf_mpcc_tpu.cc.gccsdt1_slow import t3_mask
from pyscf_mpcc_tpu.scf import RHF, UHF


def _setup(which):
    if which == "h2o":
        mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                          [1, (0, 0.757, 0.587)]], basis="6-31g")
        mf = RHF(mol)
        act_hole = ([2, 3, 4], [2, 3, 4])
        act_particle = ([0, 1, 3], [0, 1, 3])
    else:
        mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
        mf = UHF(mol)
        act_hole = ([7, 8], [5, 6])
        act_particle = ([0], [0, 1])
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    h_so = eom_slow.h_so_from_eris(so)
    na, nb = mf.mol.nelec
    # per-spin MO quantities for the DF module
    mo = np.asarray(mf.mo_coeff)
    mo_a, mo_b = (mo, mo) if mo.ndim == 2 else (mo[0], mo[1])
    eri_ao = gto.intor_eri(mol)
    nao = eri_ao.shape[0]
    w, v = np.linalg.eigh(eri_ao.reshape(nao * nao, nao * nao))
    keep = w > 1e-12
    B_ao = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
    hcore = np.asarray(mf.get_hcore())
    B = tuple(np.einsum("Lmn,mp,nq->Lpq", B_ao, c, c) for c in (mo_a, mo_b))
    h = tuple(c.T @ hcore @ c for c in (mo_a, mo_b))
    # spin-orbital -> per-spin index maps
    nmo = mo_a.shape[1]
    va, vb = nmo - na, nmo - nb
    dims = dict(na=na, nb=nb, va=va, vb=vb)
    mo_e = [np.diag(np.asarray(so.fock))[:na],  # placeholder; real below
            None]
    ea = np.asarray(mf.mo_energy[0] if np.asarray(mf.mo_energy).ndim == 2
                    else mf.mo_energy)
    eb = np.asarray(mf.mo_energy[1] if np.asarray(mf.mo_energy).ndim == 2
                    else mf.mo_energy)
    return dict(mf=mf, so=so, h_so=h_so, B=B, h=h, dims=dims,
                act_hole=act_hole, act_particle=act_particle,
                mo_energy=(ea, eb))


def _split1(t1_so, d):
    na, nb, va, vb = d["na"], d["nb"], d["va"], d["vb"]
    return t1_so[:na, :va], t1_so[na:, va:]


def _split2(t2_so, d):
    na, nb, va, vb = d["na"], d["nb"], d["va"], d["vb"]
    return (t2_so[:na, :na, :va, :va],
            t2_so[:na, na:, :va, va:],
            t2_so[na:, na:, va:, va:])


def _sig_ix(sig, d, act_hole, act_particle):
    """np.ix_ tuple selecting a canonical-signature active block out of a
    full spin-orbital 6-index array."""
    na, va = d["na"], d["va"]
    hole = {"a": np.asarray(act_hole[0], int),
            "b": na + np.asarray(act_hole[1], int)}
    part = {"a": np.asarray(act_particle[0], int),
            "b": va + np.asarray(act_particle[1], int)}
    return np.ix_(*[hole[c] for c in sig[:3]], *[part[c] for c in sig[3:]])


def _so_t3_from_canon(canon, d, act_hole, act_particle, nocc_so, nvir_so):
    """Scatter canonical active blocks into a full spin-orbital t3 (all
    signatures via antisymmetry) for oracle-side evaluation."""
    full = np.zeros((nocc_so,) * 3 + (nvir_so,) * 3)
    x = ccsdt_act.expand_t3({k: np.asarray(v) for k, v in canon.items()})
    for sig, arr in x.b.items():
        full[_sig_ix(sig, d, act_hole, act_particle)] = arr
    return full


@pytest.mark.parametrize("which,model", [("h2o", "ccsdt"),
                                         ("h2o", "ccsdt-3"),
                                         ("o2", "ccsdt")])
def test_residual_matches_oracle(which, model):
    s = _setup(which)
    so, d = s["so"], s["dims"]
    nocc, nvir = so.nocc, so.nso - so.nocc
    emp2, t1, t2 = gccsd_slow.init_amps(so)
    # dressed oracle frame
    hd, gd, fd = gccsdt_slow.dress(s["h_so"], so.ints, t1, nocc)
    erd = gccsdt_slow.DressedERIs(gd, fd, nocc)
    # a nonzero active t3: one preconditioned driving sweep
    ah = (list(s["act_hole"][0]), list(s["act_hole"][1]))
    ap = (list(s["act_particle"][0]), list(s["act_particle"][1]))
    ah_so = list(ah[0]) + [d["na"] + i for i in ah[1]]
    ap_so = list(ap[0]) + [d["va"] + i for i in ap[1]]
    mask = t3_mask(ah_so, ap_so, nocc, nvir)
    eo = np.diag(so.fock)[:nocc]
    ev = np.diag(so.fock)[nocc:]
    d3 = ((eo[:, None, None] + eo[None, :, None]
           + eo[None, None, :])[..., None, None, None]
          - (ev[:, None, None] + ev[None, :, None] + ev[None, None, :]))
    r0 = gccsdt_slow.t3_residual(t2, None, erd, model=model)
    t3_so = np.where(mask, r0 / d3, 0.0)
    R3_oracle = gccsdt_slow.t3_residual(t2, t3_so, erd, model=model)

    dd = ccsdt_act.DressedDF((d["na"], d["nb"]),
                             (d["na"] + d["va"], d["nb"] + d["vb"]),
                             ah, ap)
    arrs = ccsdt_act.dress_df(s["B"], s["h"], _split1(t1, d),
                              (d["na"], d["nb"]))
    t2st = ccsdt_act.t2_st(tuple(jnp.asarray(x) for x in _split2(t2, d)))
    canon = {sig: jnp.asarray(t3_so[_sig_ix(sig, d, ah, ap)])
             for sig in ccsdt_act.T3_CANONICAL}
    r = ccsdt_act.t3_residual_act(t2st, ccsdt_act.expand_t3(canon), dd,
                                  arrs, model=model)
    for sig in ccsdt_act.T3_CANONICAL:
        want = R3_oracle[_sig_ix(sig, d, ah, ap)]
        got = np.asarray(r[sig])
        scale = max(np.abs(want).max(), 1e-3)
        assert np.abs(got - want).max() / scale < 1e-10, sig


def test_solver_and_feedback_match_oracle_h2o():
    s = _setup("h2o")
    so, d = s["so"], s["dims"]
    nocc, nvir = so.nocc, so.nso - so.nocc
    # converged GCCSD amplitudes as the fixed (t1, t2)
    _, t1, t2, conv = gccsd_slow.kernel(so, conv_tol=1e-11,
                                        conv_tol_normt=1e-9)
    assert conv
    ah, ap = s["act_hole"], s["act_particle"]
    ah_so = list(ah[0]) + [d["na"] + i for i in ah[1]]
    ap_so = list(ap[0]) + [d["va"] + i for i in ap[1]]
    hd, gd, fd = gccsdt_slow.dress(s["h_so"], so.ints, t1, nocc)
    erd = gccsdt_slow.DressedERIs(gd, fd, nocc)
    mask = t3_mask(ah_so, ap_so, nocc, nvir)
    eo = np.diag(so.fock)[:nocc]
    ev = np.diag(so.fock)[nocc:]
    d3 = ((eo[:, None, None] + eo[None, :, None]
           + eo[None, None, :])[..., None, None, None]
          - (ev[:, None, None] + ev[None, :, None] + ev[None, None, :]))
    t3o = np.zeros_like(mask, dtype=float)
    for _ in range(200):
        R3 = gccsdt_slow.t3_residual(t2, t3o, erd, model="ccsdt-3")
        t3n = np.where(mask, t3o + R3 / d3, 0.0)
        if np.linalg.norm(t3n - t3o) < 1e-11:
            t3o = t3n
            break
        t3o = t3n

    dd = ccsdt_act.DressedDF((d["na"], d["nb"]),
                             (d["na"] + d["va"], d["nb"] + d["vb"]),
                             ah, ap)
    arrs = ccsdt_act.dress_df(s["B"], s["h"], _split1(t1, d),
                              (d["na"], d["nb"]))
    canon, conv3 = ccsdt_act.solve_t3_act(_split2(t2, d), dd, arrs,
                                          s["mo_energy"], model="ccsdt-3",
                                          conv_tol=1e-11, max_cycle=200)
    assert conv3
    for sig in ccsdt_act.T3_CANONICAL:
        want = t3o[_sig_ix(sig, d, ah, ap)]
        got = np.asarray(canon[sig])
        assert np.abs(got - want).max() < 1e-9, sig

    # feedback equality at the converged t3
    f1o, f2o = gccsdt_slow.feedback(t3o, erd)
    (r1a, r1b), (r2aa, r2ab, r2bb) = ccsdt_act.feedback_act(
        ccsdt_act.expand_t3(canon), dd, arrs)
    w1a, w1b = _split1(f1o, d)
    w2aa, w2ab, w2bb = _split2(f2o, d)
    for got, want in [(r1a, w1a), (r1b, w1b), (r2aa, w2aa),
                      (r2ab, w2ab), (r2bb, w2bb)]:
        assert np.abs(np.asarray(got) - want).max() < 1e-9


def test_kernel_pert_df_matches_oracle():
    """The production coupled driver (spin-traced UCCSD + device T3)
    converges to the oracle pert_triples fixed point."""
    from pyscf_mpcc_tpu.cc import uccsd
    from pyscf_mpcc_tpu.mpcc import umpccsd
    s = _setup("h2o")
    mf, d = s["mf"], s["dims"]
    ah, ap = s["act_hole"], s["act_particle"]
    e_o, T1, T2, T3, conv_o = umpccsd.kernel_pert_triples(
        mf, ah, ap, [], [], model="ccsdt-3", conv_tol=1e-11,
        conv_tol_normt=1e-9)
    assert conv_o
    eri_ao = gto.intor_eri(mf.mol)
    f = mf.get_fock(mf.make_rdm1())
    na, nb = mf.mol.nelec
    mo = np.asarray(mf.mo_coeff)
    ue = uccsd.make_eris_incore(eri_ao, mo, mo, f, f, na, nb)
    conv, e, t1, t2, canon = umpccsd.kernel_pert_df(
        ue, s["B"], s["h"], ah, ap, [], [], model="ccsdt-3",
        conv_tol=1e-11, conv_tol_normt=1e-9)
    assert conv
    assert abs(e - e_o) < 1e-8
    # converged active t3 blocks agree with the oracle's
    for sig in ccsdt_act.T3_CANONICAL:
        want = T3[_sig_ix(sig, d, ah, ap)]
        assert np.abs(np.asarray(canon[sig]) - want).max() < 1e-7, sig
