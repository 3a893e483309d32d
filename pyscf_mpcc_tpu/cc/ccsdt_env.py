"""Device-resident ENVIRONMENT (inactive) iterative triples from DF factors.

Production-scale counterpart of gccsdt_slow.env_triples_kernel — the role
of the fork's uccsd_t_inactive_iterative.py (:634 iterative_kernel, :733
inactive_energy, :347 update_amps_small Fock-coupled sweep, :1683-1702
t1-dressed 3-center intermediates) — built on the same TPU-first
machinery as the active solver (cc/ccsdt_act.py):

*   t3 is solved on the COMPLEMENT of the all-active block at fixed
    (t1, t2).  Unlike the active solver, every t3-bound index runs over
    its FULL range, so t3 lives as the four canonical spin-blocked
    device arrays — the fork's four numpy blocks, device-resident and
    spin-traced instead of hand-expanded.  The NumPy oracle needs the
    nso^4 dressed integrals AND a full spin-orbital t3 (8x the block
    storage, one host core); this engine runs from 3-center factors with
    MXU contractions.

*   The sweep is the oracle's t3_residual with the chosen model's
    [H, T3] couplings (model='ccsdt-1' reproduces the fork's Fock-only
    update_amps_small iteration; 'ccsdt-3'/'ccsdt' tighten it), the
    drive W built once per (t1, t2) from the dressed DF factors.

*   The active block is pinned: zero by default (the oracle's
    env_triples_kernel convention), or a fixed active-solver t3 seed
    (the fork's iterative_kernel convention, coupling active->env
    through the off-diagonal Fock blocks).

Energy:  E_env = <t1', R1(t3_env)> + pairing of <t2', R2(t3_env)> — the
adjoint contraction of the t3 feedback (fork's lhs_env_triples role),
with ``env_amplitudes=True`` zeroing the active amplitude blocks in the
pairing (fork's inactive_energy convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc.ccsdt_act import (DressedDF, T3_CANONICAL,
                                         d3_blocks, expand_t3,
                                         feedback_act, reduce_t3,
                                         t3_residual_act)
from pyscf_mpcc_tpu.cc.spinsum import t2_st

MODELS = ("ccsdt", "ccsdt-3", "ccsdt-1")


def _full_dd(nocc, nmo):
    """DressedDF whose 'active' ranges are the full ranges."""
    return DressedDF(nocc, nmo,
                     [np.arange(nocc[s]) for s in (0, 1)],
                     [np.arange(nmo[s] - nocc[s]) for s in (0, 1)])


def env_masks(nocc, nmo, act_hole, act_particle):
    """Per-canonical-signature bool arrays, True on the ENVIRONMENT
    (= every element except the all-active block)."""
    out = {}
    for sig in T3_CANONICAL:
        marks = []
        for ax, c in enumerate(sig):
            s = "ab".index(c)
            if ax < 3:
                m = np.zeros(nocc[s], bool)
                m[np.asarray(act_hole[s], int)] = True
            else:
                m = np.zeros(nmo[s] - nocc[s], bool)
                m[np.asarray(act_particle[s], int)] = True
            marks.append(m.reshape([-1 if i == ax else 1
                                    for i in range(6)]))
        allact = marks[0]
        for m in marks[1:]:
            allact = allact & m
        out[sig] = ~allact
    return out


def _seed_blocks(nocc, nmo, act_hole, act_particle, t3_act):
    """Scatter a canonical ACTIVE-block t3 dict into full-range zeros."""
    out = {}
    for sig in T3_CANONICAL:
        sp = ["ab".index(c) for c in sig]
        shape = tuple(nocc[s] for s in sp[:3]) + tuple(
            nmo[s] - nocc[s] for s in sp[3:])
        base = jnp.zeros(shape)
        if t3_act is not None and t3_act.get(sig) is not None:
            idx = ([jnp.asarray(np.asarray(act_hole[s], int))
                    for s in sp[:3]]
                   + [jnp.asarray(np.asarray(act_particle[s], int))
                      for s in sp[3:]])
            base = base.at[jnp.ix_(*idx)].set(jnp.asarray(t3_act[sig]))
        out[sig] = base
    return out


def solve_t3_env(t2_blocks, nocc, nmo, act_hole, act_particle, arrs,
                 mo_energy, model="ccsdt-3", driving="full",
                 max_cycle=60, conv_tol=1e-8, verbose=0, t3_act=None,
                 one_shot=False, diis_space=6):
    """Solve the environment t3 at fixed (t1, t2).

    t2_blocks: (t2aa, t2ab, t2bb) in the frame matching ``arrs``
    (built by ccsdt_act.dress_df from the same t1).  t3_act: optional
    canonical active-block dict held FIXED in the active slot during the
    sweep (fork iterative_kernel seeding); default pins the active block
    to zero (oracle env_triples_kernel).  Returns (t3_canonical dict over
    the FULL ranges, converged)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    if model not in MODELS:
        raise ValueError(f"unknown model {model!r}")
    log = lg.Logger(verbose=verbose)
    dd = _full_dd(nocc, nmo)
    d3 = d3_blocks(dd, mo_energy)
    masks = {k: jnp.asarray(v) for k, v in
             env_masks(nocc, nmo, act_hole, act_particle).items()}
    seed = _seed_blocks(nocc, nmo, act_hole, act_particle, t3_act)
    t2b = tuple(jnp.asarray(x) for x in t2_blocks)

    @jax.jit
    def _drive(arrs_, t2b_):
        r = t3_residual_act(t2_st(t2b_), None, dd, arrs_, model=model,
                            driving=driving)
        return reduce_t3(r)

    @jax.jit
    def _sweep(arrs_, t2b_, drive_, canon):
        coup = reduce_t3(t3_residual_act(
            t2_st(t2b_), expand_t3(canon), dd, arrs_, model=model,
            driving="none"))
        new, dn = {}, 0.0
        for k in T3_CANONICAL:
            r = drive_[k] + coup[k]
            nk = jnp.where(masks[k], canon[k] + r / d3[k], seed[k])
            dn = dn + jnp.linalg.norm(nk - canon[k])
            new[k] = nk
        return new, dn

    drive = _drive(arrs, t2b)
    canon = {k: jnp.where(masks[k], 0.0, seed[k]) for k in T3_CANONICAL}
    keys = sorted(canon.keys())
    diis = DIIS(space=diis_space) if diis_space else None
    converged = one_shot
    for it in range(1 if one_shot else max_cycle):
        canon_new, dn = _sweep(arrs, t2b, drive, canon)
        dn = float(dn)
        if diis is not None:
            vec = np.concatenate([np.asarray(canon_new[k]).ravel()
                                  for k in keys])
            vec = diis.update(vec)
            p = 0
            for k in keys:
                n = canon_new[k].size
                canon_new[k] = jnp.asarray(
                    vec[p:p + n].reshape(canon_new[k].shape))
                p += n
        canon = canon_new
        log.info("t3-env cycle %2d  |dt3| = %9.3e", it, dn)
        if not one_shot and dn < conv_tol:
            converged = True
            break
    return canon, converged


def env_energy(t3_canon, nocc, nmo, act_hole, act_particle, arrs,
               t1, t2, env_amplitudes=False):
    """Adjoint env-triples energy <t1', R1(t3)> + <t2', R2(t3)>.

    t3_canon: full-range canonical dict (active block is re-zeroed here,
    so a seeded solve contributes only its environment part — the fork
    zeroes the active block before lhs_env_triples the same way).
    Pairing weights follow the spin-orbital sum 1/4 <t2_so, R2_so>:
    1/4 (aa) + 1/4 (bb) + 1 (ab)."""
    dd = _full_dd(nocc, nmo)
    masks = env_masks(nocc, nmo, act_hole, act_particle)
    t3z = {k: jnp.asarray(t3_canon[k]) * jnp.asarray(masks[k])
           for k in T3_CANONICAL}
    (r1a, r1b), (r2aa, r2ab, r2bb) = feedback_act(
        expand_t3(t3z), dd, arrs)
    t1a, t1b = (jnp.asarray(x) for x in t1)
    t2aa, t2ab, t2bb = (jnp.asarray(x) for x in t2)
    if env_amplitudes:
        m1 = []
        for s, t in ((0, t1a), (1, t1b)):
            m = np.zeros(t.shape, bool)
            m[np.ix_(np.asarray(act_hole[s], int),
                     np.asarray(act_particle[s], int))] = True
            m1.append(jnp.asarray(m))
        t1a = jnp.where(m1[0], 0.0, t1a)
        t1b = jnp.where(m1[1], 0.0, t1b)
        t2aa = jnp.where(m1[0][:, None, :, None] & m1[0][None, :, None, :],
                         0.0, t2aa)
        t2ab = jnp.where(m1[0][:, None, :, None] & m1[1][None, :, None, :],
                         0.0, t2ab)
        t2bb = jnp.where(m1[1][:, None, :, None] & m1[1][None, :, None, :],
                         0.0, t2bb)
    e = (jnp.vdot(t1a, r1a) + jnp.vdot(t1b, r1b)
         + 0.25 * jnp.vdot(t2aa, r2aa) + jnp.vdot(t2ab, r2ab)
         + 0.25 * jnp.vdot(t2bb, r2bb))
    return float(e)


def kernel(B, h, t1, t2, nocc, act_hole, act_particle, mo_energy,
           model="ccsdt-3", driving="full", max_cycle=60, conv_tol=1e-8,
           verbose=0, t3_act=None, one_shot=False,
           env_amplitudes=False):
    """One-call environment-triples correction at fixed (t1, t2).

    B: per-spin FULL-MO 3-center factors (naux, nmo, nmo); h: per-spin
    one-electron MO integrals; t1/t2: per-spin UCCSD amplitudes.
    Returns (e_env, t3_canonical, converged)."""
    from pyscf_mpcc_tpu.cc import ccsdt_act
    nmo = (B[0].shape[1], B[1].shape[1])
    arrs = ccsdt_act.dress_df(B, h, t1, nocc)
    t3, conv = solve_t3_env(t2, nocc, nmo, act_hole, act_particle, arrs,
                            mo_energy, model=model, driving=driving,
                            max_cycle=max_cycle, conv_tol=conv_tol,
                            verbose=verbose, t3_act=t3_act,
                            one_shot=one_shot)
    e = env_energy(t3, nocc, nmo, act_hole, act_particle, arrs, t1, t2,
                   env_amplitudes=env_amplitudes)
    return e, t3, conv
