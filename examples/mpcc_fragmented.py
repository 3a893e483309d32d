#!/usr/bin/env python
"""Fragmented MP-CC workflow — the flagship pipeline of the MPCC fork.

Mirrors the reference example examples/cc/44-mpcc/n2_rohf_umpccsd.py:
localize orbitals, solve the MP2 bath with the non-canonical iterative
solver, then relax CCSD amplitudes on an active fragment with the bath
frozen, and compare against global CCSD / MP2.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import CCSD
from pyscf_mpcc_tpu.mpcc import workflow
from pyscf_mpcc_tpu.scf import RHF


def main():
    mol = gto.M(
        atom="O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587",
        basis="cc-pvdz")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()

    cc = CCSD(mf)
    cc.conv_tol = 1e-9
    e_ccsd, *_ = cc.kernel()
    e_mp2 = cc.emp2
    print(f"MP2  E_corr = {e_mp2:.10f}")
    print(f"CCSD E_corr = {e_ccsd:.10f}")

    # MPCCSD(4,2)-style: only the all-active doubles block relaxes, the
    # environment stays at its (localized, iterative) MP2 value
    e_mpcc, t1, t2, c_loc, spaces = workflow.fragmented_mpcc(
        mol, mf, fragments=[[0]],          # oxygen fragment
        idx_s=[], idx_d=list(range(15)),
        pop_threshold=0.3)
    act_hole, act_particle = spaces[0]
    print(f"fragment active holes:     {act_hole}")
    print(f"fragment active particles: {act_particle}")
    print(f"MPCC E_corr = {e_mpcc:.10f}")
    print(f"  recovers {100*(e_mpcc-e_mp2)/(e_ccsd-e_mp2):.1f}% of the "
          "CCSD-beyond-MP2 correlation")


if __name__ == "__main__":
    main()
