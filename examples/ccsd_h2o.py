#!/usr/bin/env python
"""Minimal end-to-end run: integrals -> RHF -> CCSD -> (T) -> RDMs."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_enable_x64", True)

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import CCSD
from pyscf_mpcc_tpu.scf import RHF


def main():
    mol = gto.M(atom="O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587",
                basis="cc-pvdz")
    mf = RHF(mol)
    mf.kernel()
    print(f"E(RHF)   = {mf.e_tot:.10f}")

    cc = CCSD(mf).run()
    print(f"E(CCSD)  = {cc.e_tot:.10f}  (E_corr = {cc.e_corr:.10f})")
    et = cc.ccsd_t()
    print(f"E(T)     = {et:.10f}")
    rdm1 = cc.make_rdm1()
    print(f"tr(rdm1) = {float(rdm1.trace()):.8f}")


if __name__ == "__main__":
    main()
