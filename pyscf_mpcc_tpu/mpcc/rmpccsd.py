"""Restricted MP-CC hybrid (RMPCCSD): CCSD relaxation on selected
active-space blocks embedded in a frozen MP2 bath.

Capability match for the reference's cc/rmpccsd_slow.py (kernel :219,
update freeze :172-178): the full RCCSD residual is evaluated by the same
jitted update as cc.rccsd, then the blocks selected by idx_s/idx_d are
reset to their incoming (bath) values via a static boolean mask — the
jnp.where replaces the reference's 16-way np.ix_ overwrite loop and keeps
the whole iteration on device.

Semantics: frozen blocks hold the values passed in as the initial t1/t2
(typically non-canonical iterative MP2 amplitudes in a localized basis);
only unfrozen blocks are CC-relaxed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import rccsd
from pyscf_mpcc_tpu.cc.eris import RERIs
from pyscf_mpcc_tpu.mpcc.masks import frozen_masks


@partial(jax.jit, static_argnames=("ntile", "bath_update"))
def update_amps_masked(t1, t2, eris, m1, m2, level_shift=0.0, ntile=1,
                       bath_update="freeze"):
    """CC update with the frozen blocks either held at their incoming
    values ('freeze', the reference's default overwrite semantics) or
    relaxed at MP2 level ('mp2': non-canonical Jacobi MP2 sweep on the
    bath blocks — the oo_mp2 update family of umpccsd.py:76-92)."""
    t1new, t2new = rccsd.update_amps(t1, t2, eris, level_shift, ntile=ntile)
    if bath_update == "mp2":
        from pyscf_mpcc_tpu.mp import mp2 as mp2_mod
        nocc = eris.nocc
        foo = eris.fock[:nocc, :nocc]
        fvv = eris.fock[nocc:, nocc:]
        t2_mp2, _ = mp2_mod.update_amps(t2, eris.ovov, foo, fvv)
        t1new = jnp.where(m1, jnp.zeros_like(t1), t1new)
        t2new = jnp.where(m2, t2_mp2, t2new)
    else:
        t1new = jnp.where(m1, t1, t1new)
        t2new = jnp.where(m2, t2, t2new)
    return t1new, t2new


def kernel(eris: RERIs, act_hole, act_particle, idx_s, idx_d,
           t1=None, t2=None, max_cycle=50, conv_tol=1e-8,
           conv_tol_normt=1e-6, diis_space=6, verbose=0, ntile=1,
           bath_update="freeze"):
    """MP-CC iteration.  Returns (converged, e_corr, t1, t2).

    t1/t2 defaults to the MP2 guess (making the frozen bath = canonical
    MP2); for the fragmented workflow pass localized-basis iterative-MP2
    amplitudes.
    """
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    nocc, nvir = eris.nocc, eris.nvir
    m1, m2 = frozen_masks(act_hole, act_particle, nocc, nvir, idx_s, idx_d)
    m1 = jnp.asarray(m1)
    m2 = jnp.asarray(m2)

    emp2, t1_0, t2_0 = rccsd.init_amps(eris)
    if t1 is None:
        t1 = t1_0
    if t2 is None:
        t2 = t2_0
    log.info("RMPCCSD init E_corr = %.14f", float(rccsd.energy(t1, t2, eris)))
    diis = DIIS(space=diis_space)
    e_last = float(rccsd.energy(t1, t2, eris))
    converged = False
    for it in range(max_cycle):
        t1new, t2new = update_amps_masked(t1, t2, eris, m1, m2, ntile=ntile,
                                          bath_update=bath_update)
        normt = float(jnp.linalg.norm(t1new - t1)
                      + jnp.linalg.norm(t2new - t2))
        vec = np.concatenate([np.asarray(t1new).ravel(),
                              np.asarray(t2new).ravel()])
        vec = diis.update(vec)
        t1 = jnp.asarray(vec[: nocc * nvir].reshape(nocc, nvir))
        t2 = jnp.asarray(vec[nocc * nvir:].reshape(t2new.shape))
        # (DIIS coefficients sum to 1, so the frozen blocks — identical in
        # every history vector — are preserved exactly by extrapolation.)
        e = float(rccsd.energy(t1, t2, eris))
        log.info("cycle %2d  E_corr(MPCC) = %.14f  dE = %10.3e  |dt| = %9.3e",
                 it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return converged, e, t1, t2
