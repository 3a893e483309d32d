"""Run the reference PySCF fork as a parity oracle with integrals
injected from OUR McMurchie-Davidson engine.

Requires `bash tools/build_reference_oracle.sh` first (libcint-free
build of the reference's BLAS-only C kernels + a symlink shim tree
under .scratch/oracle).  Because no integral library exists in the
shim, every AO quantity (ovlp/hcore/ERI, and DF 3c factors if wanted)
comes from pyscf_mpcc_tpu.gto.intor -- so the reference and our
framework run on bit-identical integrals and energy differences
measure the correlation solvers alone.

Usage (scripts only; tests pin the printed values):
    PYTHONPATH=.scratch/oracle python tools/pin_reference_values.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def our_integrals(atom, basis, unit="angstrom", spin=0):
    """(mymol, ovlp, hcore, eri_chemists_s1) from our engine, fp64."""
    from pyscf_mpcc_tpu import gto as mygto
    from pyscf_mpcc_tpu.gto import intor

    mymol = mygto.M(atom=atom, basis=basis, unit=unit, spin=spin)
    s, t = (np.asarray(x) for x in intor.intor_ovlp_kin(mymol))
    v = np.asarray(intor.intor_nuc(mymol))
    eri = np.asarray(intor.intor_eri(mymol))
    return mymol, s, t + v, eri


def reference_mf(atom, basis, unit="angstrom", kind="RHF", conv_tol=1e-12,
                 verbose=0, spin=0):
    """A converged reference scf object running on OUR integrals."""
    from pyscf import gto, scf, ao2mo

    mymol, s, hcore, eri = our_integrals(atom, basis, unit, spin=spin)
    mol = gto.M(atom=atom, basis=basis, unit=unit, verbose=verbose,
                spin=spin)
    mol.incore_anyway = True
    assert mol.nao_nr() == s.shape[0], (mol.nao_nr(), s.shape)
    mf = {"RHF": scf.RHF, "UHF": scf.UHF, "ROHF": scf.ROHF,
          "GHF": scf.GHF}[kind](mol)
    nao = s.shape[0]
    if kind == "GHF":
        # GHF J/K builder consumes the spatial _eri with spin-blocked dm
        mf.get_hcore = lambda *a: np.block(
            [[hcore, np.zeros_like(hcore)], [np.zeros_like(hcore), hcore]])
        mf.get_ovlp = lambda *a: np.block(
            [[s, np.zeros_like(s)], [np.zeros_like(s), s]])
    else:
        mf.get_hcore = lambda *a: hcore
        mf.get_ovlp = lambda *a: s
    mf._eri = ao2mo.restore(8, eri, nao)
    mf.init_guess = "1e"       # minao/atom guesses need libcint
    mf.conv_tol = conv_tol
    mf.max_cycle = 200
    mf.kernel()
    assert mf.converged, "reference SCF did not converge"
    return mf
