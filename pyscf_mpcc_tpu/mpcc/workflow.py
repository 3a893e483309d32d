"""Fragmented MP-CC workflows — the fork's flagship end-to-end pipeline.

Reference: examples/cc/44-mpcc/n2_rohf_umpccsd.py (get_localized_orbs :12,
fragmented_mpcc :254-299): localize orbitals, solve non-canonical iterative
MP2 in the localized basis (the bath), then for each fragment run MP-CC
with the fragment's active holes/particles, chaining t1/t2 between
fragments.

This module provides the restricted pipeline on top of the JAX RCCSD/
iterative-MP2/rmpccsd stack with in-framework PM localization and
Lowdin-population fragment assignment.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import eris as eris_mod
from pyscf_mpcc_tpu.lo.pm import lowdin_populations, pm_localize
from pyscf_mpcc_tpu.mp import mp2
from pyscf_mpcc_tpu.mpcc import rmpccsd


def localize_occ_vir(mol, mf, n_core=0, max_sweeps=100):
    """PM-localize the valence-occupied and virtual blocks separately.

    Returns the localized coefficient matrix (core orbitals untouched).
    """
    C = np.asarray(mf.mo_coeff).copy()
    nocc = mol.nelectron // 2
    S = mf.S
    if nocc - n_core > 1:
        C[:, n_core:nocc], _ = pm_localize(mol, C[:, n_core:nocc], S=S,
                                           max_sweeps=max_sweeps)
    if C.shape[1] - nocc > 1:
        C[:, nocc:], _ = pm_localize(mol, C[:, nocc:], S=S,
                                     max_sweeps=max_sweeps)
    return C


def fragment_spaces(mol, mf, c_loc, fragments, pop_threshold=0.3):
    """Assign localized orbitals to atom-set fragments by Lowdin population.

    fragments: list of atom-index lists.  Returns per-fragment
    (act_hole, act_particle) index arrays (occupied-block / virtual-block
    relative), the form rmpccsd.kernel consumes.
    """
    nocc = mol.nelectron // 2
    q = lowdin_populations(mol, c_loc, S=mf.S)  # (natm, nmo)
    out = []
    for atoms in fragments:
        frag_pop = q[np.asarray(atoms, dtype=int)].sum(axis=0)
        act_hole = np.where(frag_pop[:nocc] > pop_threshold)[0]
        act_particle = np.where(frag_pop[nocc:] > pop_threshold)[0]
        out.append((act_hole, act_particle))
    return out


def fragmented_mpcc(mol, mf, fragments, idx_s, idx_d, eri_ao=None,
                    pop_threshold=0.3, n_core=0, verbose=0,
                    mp2_conv=1e-10, cc_conv=1e-8):
    """Run the fragmented restricted MP-CC pipeline.

    Returns (e_corr, t1, t2, c_loc, spaces).
    """
    nocc = mol.nelectron // 2
    c_loc = localize_occ_vir(mol, mf, n_core=n_core)
    if eri_ao is None:
        eri_ao = gto.intor_eri(mol)
    dm = mf.make_rdm1()
    fock_ao = mf.get_fock(dm)
    er = eris_mod.make_eris_incore(eri_ao, c_loc, fock_ao, nocc)

    # the MP2 bath: non-canonical iterative solver in the localized basis
    fock_mo = np.asarray(er.fock)
    e_mp2, t2_bath, conv = mp2.iterative_kernel(
        er.ovov, jnp.asarray(fock_mo[:nocc, :nocc]),
        jnp.asarray(fock_mo[nocc:, nocc:]), conv_tol=mp2_conv,
        max_cycle=200, verbose=verbose)
    if not conv:
        raise RuntimeError("bath MP2 did not converge")

    spaces = fragment_spaces(mol, mf, c_loc, fragments, pop_threshold)
    t1 = jnp.zeros((nocc, er.nvir), dtype=t2_bath.dtype)
    t2 = t2_bath
    e = e_mp2
    for (act_hole, act_particle) in spaces:
        conv, e, t1, t2 = rmpccsd.kernel(
            er, act_hole, act_particle, idx_s, idx_d, t1=t1, t2=t2,
            conv_tol=cc_conv, verbose=verbose, max_cycle=100)
        if not conv:
            raise RuntimeError("fragment MP-CC did not converge")
    return e, t1, t2, c_loc, spaces
