"""Unrestricted MP-CC hybrid (UMPCCSD): the fork's flagship method.

Reference: pyscf/cc/umpccsd.py:1820 (update_amps) + :2219-2235 (block
freeze) + :2550 (kernel API).  Full UCCSD residual from cc.uccsd, then the
blocks selected by idx_s/idx_d (per spin channel) are reset to their
incoming bath values with static boolean masks.  act_hole/act_particle are
(alpha, beta) index-array pairs; idx_s = (idx_s_alpha, idx_s_beta);
idx_d = (idx_d_aa, idx_d_ab, idx_d_bb) — the alpha-beta doubles blocks use
the mixed tuples exactly as the reference's idx_d_ab construction
(umpccsd.py:2222).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import uccsd
from pyscf_mpcc_tpu.mpcc.masks import doubles_blocks, singles_blocks


def frozen_masks_u(act_hole, act_particle, nocc, nvir, idx_s, idx_d):
    """Masks (m1a, m1b, m2aa, m2ab, m2bb) for the unrestricted freeze.

    nocc/nvir: (nocca, noccb)/(nvira, nvirb); act_* are (alpha, beta).
    """
    (aha, ahb), (apa, apb) = act_hole, act_particle
    (na, nb), (va, vb) = nocc, nvir
    sa = singles_blocks(aha, apa, na, va)
    sb = singles_blocks(ahb, apb, nb, vb)
    daa = doubles_blocks(aha, apa, na, va)
    dbb = doubles_blocks(ahb, apb, nb, vb)
    dab = doubles_blocks(aha, apa, na, va, ahb, apb, nb, vb)

    def combine(blocks, idx, shape):
        m = np.zeros(shape, dtype=bool)
        for i in idx:
            m |= blocks[i]
        return jnp.asarray(m)

    m1a = combine(sa, idx_s[0], (na, va))
    m1b = combine(sb, idx_s[1], (nb, vb))
    m2aa = combine(daa, idx_d[0], (na, na, va, va))
    m2ab = combine(dab, idx_d[1], (na, nb, va, vb))
    m2bb = combine(dbb, idx_d[2], (nb, nb, vb, vb))
    return m1a, m1b, m2aa, m2ab, m2bb


@jax.jit
def update_amps_masked(t1, t2, eris, masks, level_shift=0.0):
    m1a, m1b, m2aa, m2ab, m2bb = masks
    (u1a, u1b), (u2aa, u2ab, u2bb) = uccsd.update_amps(
        t1, t2, eris, level_shift)
    u1a = jnp.where(m1a, t1[0], u1a)
    u1b = jnp.where(m1b, t1[1], u1b)
    u2aa = jnp.where(m2aa, t2[0], u2aa)
    u2ab = jnp.where(m2ab, t2[1], u2ab)
    u2bb = jnp.where(m2bb, t2[2], u2bb)
    return (u1a, u1b), (u2aa, u2ab, u2bb)


def kernel(eris, act_hole, act_particle, idx_s, idx_d, t1=None, t2=None,
           max_cycle=50, conv_tol=1e-8, conv_tol_normt=1e-6, diis_space=6,
           verbose=0, level_shift=0.0, oo_mp2=False,
           oomp2_variant="standard"):
    """UMPCCSD iteration.  Returns (converged, e_corr, t1, t2).

    idx_s/idx_d may be given per the reference API: idx_s=(list_a, list_b),
    idx_d=(list_aa, list_ab, list_bb); passing plain lists applies them to
    every spin channel.

    oo_mp2=True replaces the CCSD update with the selected OO-MP2
    low-level operator (mpcc/oomp2.py; reference umpccsd.py:76-92) — the
    bath-relaxation step of the fragmented workflow, where the listed
    blocks are frozen at their incoming (fragment-CC) values and
    everything else relaxes at MP2-like cost structure.
    """
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    na, nb = uccsd._nocc(eris)
    va = eris.ovov.shape[1]
    vb = eris.OVOV.shape[1]
    if idx_s and not isinstance(idx_s[0], (list, tuple, np.ndarray)):
        idx_s = (idx_s, idx_s)
    if idx_d and not isinstance(idx_d[0], (list, tuple, np.ndarray)):
        idx_d = (idx_d, idx_d, idx_d)
    if not idx_s:
        idx_s = ([], [])
    if not idx_d:
        idx_d = ([], [], [])
    masks = frozen_masks_u(act_hole, act_particle, (na, nb), (va, vb),
                           idx_s, idx_d)
    if oo_mp2:
        from pyscf_mpcc_tpu.mpcc.oomp2 import update_amps_oomp2
        from pyscf_mpcc_tpu.mpcc.masks import doubles_blocks
        (aha, ahb), (apa, apb) = act_hole, act_particle
        act_m = (jnp.asarray(doubles_blocks(aha, apa, na, va)[15]),
                 jnp.asarray(doubles_blocks(aha, apa, na, va,
                                            ahb, apb, nb, vb)[15]),
                 jnp.asarray(doubles_blocks(ahb, apb, nb, vb)[15]))

        def base_update(t1_, t2_, eris_, ls):
            return update_amps_oomp2(t1_, t2_, eris_,
                                     variant=oomp2_variant,
                                     act_masks=act_m, level_shift=ls)
    else:
        base_update = uccsd.update_amps

    def masked_update(t1_, t2_, eris_, mks, ls):
        m1a, m1b, m2aa, m2ab, m2bb = mks
        (u1a, u1b), (u2aa, u2ab, u2bb) = base_update(t1_, t2_, eris_, ls)
        u1a = jnp.where(m1a, t1_[0], u1a)
        u1b = jnp.where(m1b, t1_[1], u1b)
        u2aa = jnp.where(m2aa, t2_[0], u2aa)
        u2ab = jnp.where(m2ab, t2_[1], u2ab)
        u2bb = jnp.where(m2bb, t2_[2], u2bb)
        return (u1a, u1b), (u2aa, u2ab, u2bb)

    emp2, t1_0, t2_0 = uccsd.init_amps(eris)
    if t1 is None:
        t1 = t1_0
    if t2 is None:
        t2 = t2_0
    shapes = [x.shape for x in (*t1, *t2)]
    diis = DIIS(space=diis_space)
    e_last = float(uccsd.energy(t1, t2, eris))
    log.info("UMPCCSD init E_corr = %.14f", e_last)
    converged = False
    e = e_last
    for it in range(max_cycle):
        t1new, t2new = masked_update(t1, t2, eris, masks, level_shift)
        normt = sum(float(jnp.linalg.norm(a - b))
                    for a, b in zip((*t1new, *t2new), (*t1, *t2)))
        vec = np.asarray(uccsd.amplitudes_to_vector(t1new, t2new))
        vec = diis.update(vec)
        t1, t2 = uccsd.vector_to_amplitudes(jnp.asarray(vec), shapes)
        e = float(uccsd.energy(t1, t2, eris))
        log.info("cycle %2d  E_corr(UMPCC) = %.14f  dE = %10.3e  |dt| = %9.3e",
                 it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return converged, e, t1, t2


def lambda_kernel(eris, t1, t2, act_hole, act_particle, idx_s, idx_d,
                  max_cycle=50, conv_tol=1e-7, verbose=0):
    """Fragment/environment-split unrestricted Lambda (the fork's
    umpccsd_lambda capability): the frozen-block mask removes the bath
    equations from the AD-generated Lambda system."""
    from pyscf_mpcc_tpu.cc import lambda_ad
    na, nb = uccsd._nocc(eris)
    va = eris.ovov.shape[1]
    vb = eris.OVOV.shape[1]
    if idx_s and not isinstance(idx_s[0], (list, tuple, np.ndarray)):
        idx_s = (idx_s, idx_s)
    if idx_d and not isinstance(idx_d[0], (list, tuple, np.ndarray)):
        idx_d = (idx_d, idx_d, idx_d)
    if not idx_s:
        idx_s = ([], [])
    if not idx_d:
        idx_d = ([], [], [])
    masks = frozen_masks_u(act_hole, act_particle, (na, nb), (va, vb),
                           idx_s, idx_d)
    return lambda_ad.kernel_u(t1, t2, eris, max_cycle=max_cycle,
                              conv_tol=conv_tol, verbose=verbose,
                              masks=masks)


def _masks_to_spin_orbital(masks, nocc, nvir):
    """Map blocked freeze masks (m1a, m1b, m2aa, m2ab, m2bb) to boolean
    spin-orbital masks over [occ_a, occ_b | vir_a, vir_b] ordering."""
    m1a, m1b, m2aa, m2ab, m2bb = (np.asarray(m) for m in masks)
    na, nb = nocc
    va, vb = nvir
    no, nv = na + nb, va + vb
    M1 = np.zeros((no, nv), dtype=bool)
    M1[:na, :va] = m1a
    M1[na:, va:] = m1b
    M2 = np.zeros((no, no, nv, nv), dtype=bool)
    M2[:na, :na, :va, :va] = m2aa
    M2[na:, na:, va:, va:] = m2bb
    M2[:na, na:, :va, va:] = m2ab
    M2[na:, :na, va:, :va] = m2ab.transpose(1, 0, 3, 2)
    M2[:na, na:, va:, :va] = m2ab.transpose(0, 1, 3, 2)
    M2[na:, :na, :va, va:] = m2ab.transpose(1, 0, 2, 3)
    return M1, M2


def kernel_pert_df(eris, B, h, act_hole, act_particle, idx_s, idx_d,
                   model="ccsdt-3", max_cycle=100, conv_tol=1e-9,
                   conv_tol_normt=1e-7, diis_space=6, verbose=0,
                   t1=None, t2=None, level_shift=0.0):
    """UMPCC with coupled active-space T3 at DF/production scale.

    The PRODUCTION counterpart of kernel_pert_triples: the spin-traced
    UCCSD engine (cc/uccsd.update_amps) supplies R1/R2, the device-
    resident DF T3 engine (cc/ccsdt_act) supplies the active-block T3
    sweep and its (R1, R2) feedback — t3 is never materialized outside
    the active block and the integrals enter only as dressed 3-center
    factors.  Fork counterpart: umpccsd.py:2183-2197 pert_triples +
    umpcc_t_slow.iterative_update_amps_t3.

    eris: uccsd.UERIs at the same orbitals as B/h; B: per-spin FULL-MO
    3-center factors (naux, nmo, nmo); h: per-spin one-electron MO
    integrals.  act_hole/act_particle: per-spin active lists; idx_s/idx_d
    frozen-block lists as in kernel().  t3 carries its own DIIS history
    (reference cc/ccsd.py:79-87,1278 run_diis_t3).
    Returns (converged, e_corr, t1, t2, t3_canonical)."""
    from pyscf_mpcc_tpu.cc import ccsdt_act
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    na, nb = uccsd._nocc(eris)
    va = eris.ovov.shape[1]
    vb = eris.OVOV.shape[1]
    if idx_s and not isinstance(idx_s[0], (list, tuple, np.ndarray)):
        idx_s = (idx_s, idx_s)
    if idx_d and not isinstance(idx_d[0], (list, tuple, np.ndarray)):
        idx_d = (idx_d, idx_d, idx_d)
    if not idx_s:
        idx_s = ([], [])
    if not idx_d:
        idx_d = ([], [], [])
    masks = frozen_masks_u(act_hole, act_particle, (na, nb), (va, vb),
                           idx_s, idx_d)
    dd = ccsdt_act.DressedDF((na, nb), (na + va, nb + vb),
                             act_hole, act_particle)
    ea, eb = eris.mo_energy
    d1a = ea[:na, None] - ea[None, na:] - level_shift
    d1b = eb[:nb, None] - eb[None, nb:] - level_shift
    d2aa = d1a[:, None, :, None] + d1a[None, :, None, :]
    d2ab = d1a[:, None, :, None] + d1b[None, :, None, :]
    d2bb = d1b[:, None, :, None] + d1b[None, :, None, :]
    d3 = ccsdt_act.d3_blocks(dd, (ea, eb))

    emp2, t1_0, t2_0 = uccsd.init_amps(eris)
    if t1 is None:
        t1 = t1_0
    if t2 is None:
        t2 = t2_0
    shapes = [x.shape for x in (*t1, *t2)]
    canon = None
    diis = DIIS(space=diis_space)
    diis3 = DIIS(space=diis_space)
    e_last = float(uccsd.energy(t1, t2, eris))
    converged = False
    e = e_last
    for it in range(max_cycle):
        arrs = ccsdt_act.dress_df(B, h, t1, (na, nb))
        t2st = ccsdt_act.t2_st(tuple(jnp.asarray(x) for x in t2))
        t3 = (ccsdt_act.expand_t3(canon) if canon is not None else None)
        r3 = ccsdt_act.reduce_t3(ccsdt_act.t3_residual_act(
            t2st, t3, dd, arrs, model=model))
        canon_new = {k: (canon[k] if canon is not None else 0.0)
                     + r3[k] / d3[k] for k in r3}
        dn3 = (sum(float(jnp.linalg.norm(canon_new[k] - canon[k]))
                   for k in canon_new) if canon is not None
               else sum(float(jnp.linalg.norm(v)) for v in
                        canon_new.values()))
        keys = sorted(canon_new.keys())
        vec3 = np.concatenate([np.asarray(canon_new[k]).ravel()
                               for k in keys])
        vec3 = diis3.update(vec3)
        canon = {}
        p = 0
        for k in keys:
            n = int(np.prod(canon_new[k].shape))
            canon[k] = jnp.asarray(vec3[p:p + n].reshape(
                canon_new[k].shape))
            p += n

        (f1a, f1b), (f2aa, f2ab, f2bb) = ccsdt_act.feedback_act(
            ccsdt_act.expand_t3(canon), dd, arrs)
        (u1a, u1b), (u2aa, u2ab, u2bb) = uccsd.update_amps(
            t1, t2, eris, level_shift)
        u1a = u1a + f1a / d1a
        u1b = u1b + f1b / d1b
        u2aa = u2aa + f2aa / d2aa
        u2ab = u2ab + f2ab / d2ab
        u2bb = u2bb + f2bb / d2bb
        m1a, m1b, m2aa, m2ab, m2bb = masks
        u1a = jnp.where(m1a, t1[0], u1a)
        u1b = jnp.where(m1b, t1[1], u1b)
        u2aa = jnp.where(m2aa, t2[0], u2aa)
        u2ab = jnp.where(m2ab, t2[1], u2ab)
        u2bb = jnp.where(m2bb, t2[2], u2bb)
        t1new, t2new = (u1a, u1b), (u2aa, u2ab, u2bb)
        normt = sum(float(jnp.linalg.norm(a - b))
                    for a, b in zip((*t1new, *t2new), (*t1, *t2))) + dn3
        vec = np.asarray(uccsd.amplitudes_to_vector(t1new, t2new))
        vec = diis.update(vec)
        t1, t2 = uccsd.vector_to_amplitudes(jnp.asarray(vec), shapes)
        e = float(uccsd.energy(t1, t2, eris))
        log.info("cycle %2d  E_corr(UMPCC+T3/df) = %.14f  dE = %10.3e  "
                 "|dt| = %9.3e", it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return converged, e, t1, t2, canon


def kernel_pert_triples(mf, act_hole, act_particle, idx_s, idx_d,
                        model="ccsdt-3", max_cycle=100, conv_tol=1e-9,
                        conv_tol_normt=1e-7, verbose=0, t1=None, t2=None):
    """UMPCC with coupled active-space T3 (the fork's pert_triples path,
    umpccsd.py:2183-2197 + ccsd.py:79-87,1278): the CCSD equations with
    the MP-CC block freeze PLUS an iteratively solved T3 restricted to the
    all-active triples block, fed back into the t1/t2 residuals, with its
    own DIIS history.  Spin-orbital engine (cc/gccsdt_slow, oracle-locked)
    — appropriate for the small active spaces this method targets.

    act_hole/act_particle: (alpha_list, beta_list) spatial indices;
    idx_s/idx_d: the frozen-block lists (reference get_index_tuples
    enumeration).  Returns (e_corr, t1_so, t2_so, t3_so, converged)."""
    from pyscf_mpcc_tpu.cc import eom_slow, gccsd_slow, gccsdt_slow
    so = gccsd_slow.eris_from_scf(mf)
    h_so = eom_slow.h_so_from_eris(so)
    na, nb = mf.mol.nelec
    nmo = np.asarray(mf.mo_coeff).shape[-1]
    va, vb = nmo - na, nmo - nb
    if idx_s and not isinstance(idx_s[0], (list, tuple, np.ndarray)):
        idx_s = (idx_s, idx_s)
    if idx_d and not isinstance(idx_d[0], (list, tuple, np.ndarray)):
        idx_d = (idx_d, idx_d, idx_d)
    if not idx_s:
        idx_s = ([], [])
    if not idx_d:
        idx_d = ([], [], [])
    masks = frozen_masks_u(act_hole, act_particle, (na, nb), (va, vb),
                           idx_s, idx_d)
    M1, M2 = _masks_to_spin_orbital(masks, (na, nb), (va, vb))
    (aha, ahb), (apa, apb) = act_hole, act_particle
    act_hole_so = list(aha) + [na + int(i) for i in ahb]
    act_particle_so = list(apa) + [va + int(p) for p in apb]
    e, T1, T2, T3, conv = gccsdt_slow.kernel(
        so, h_so, act_hole=act_hole_so, act_particle=act_particle_so,
        model=model, max_cycle=max_cycle, conv_tol=conv_tol,
        conv_tol_normt=conv_tol_normt, verbose=verbose,
        t1=t1, t2=t2, freeze_mask1=M1, freeze_mask2=M2)
    return e, T1, T2, T3, conv
