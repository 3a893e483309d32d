#!/usr/bin/env python
"""Unrestricted MP-CC on an open-shell system (O2 triplet).

The unrestricted analog of the fragmented workflow: UHF -> UCCSD-quality
active block embedded in an MP2 bath via the per-spin-channel freeze masks
(the reference's flagship umpccsd kernel API)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_enable_x64", True)

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import uccsd
from pyscf_mpcc_tpu.mpcc import umpccsd
from pyscf_mpcc_tpu.scf import UHF


def main():
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    print(f"E(UHF) = {mf.e_tot:.10f}")

    ue = uccsd.eris_from_scf(mf)
    emp2, _, _ = uccsd.init_amps(ue)
    conv, e_cc, *_ = uccsd.kernel(ue, conv_tol=1e-9)
    print(f"UMP2  E_corr = {float(emp2):.10f}")
    print(f"UCCSD E_corr = {e_cc:.10f}")

    # active space: the open-shell pi system (top occupieds / low virtuals;
    # alpha has a single virtual in this minimal basis)
    na, nb = mol.nelec
    act_hole = ([na - 2, na - 1], [nb - 2, nb - 1])
    act_particle = ([0], [0, 1])
    conv, e_mpcc, *_ = umpccsd.kernel(
        ue, act_hole, act_particle, idx_s=[], idx_d=list(range(15)),
        conv_tol=1e-9)
    print(f"UMPCC E_corr = {e_mpcc:.10f}  "
          f"({100*(e_mpcc-float(emp2))/(e_cc-float(emp2)):.1f}% of "
          "UCCSD-beyond-MP2)")


if __name__ == "__main__":
    main()
