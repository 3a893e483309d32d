#!/usr/bin/env python
"""Round-2 property stack showcase on H2O.

Exercises, end to end on one molecule:
  * DF-MP2 with unrelaxed AND orbital-relaxed densities + natural
    orbitals (mp/dfmp2.py — AD Z-vector),
  * MP2-F12/SP explicitly-correlated correction (mp/mp2f12.py),
  * CCSD with T1/D1/D2 diagnostics,
  * EOM-CCSD: EE, IP, EA, and spin-flip roots,
  * moment-conserving GF-CCSD poles + the 1-RDM from its zeroth moment,
  * AutoAux fitting-basis generation (df/autoaux.py).

Runs in a few minutes on CPU:  python examples/properties_showcase.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc.driver import RCCSDDriver
from pyscf_mpcc_tpu.cc.momgfccsd import MomGFCCSD
from pyscf_mpcc_tpu.mp.dfmp2 import DFRMP2
from pyscf_mpcc_tpu.mp.mp2f12 import energy_f12
from pyscf_mpcc_tpu.scf import RHF

ATOM = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"

mol = gto.M(atom=ATOM, basis="cc-pvdz", unit="angstrom")
mf = RHF(mol).density_fit(auxbasis="autoaux")
mf.conv_tol = 1e-12
mf.kernel()
print(f"RHF (AutoAux DF)      E = {mf.e_tot:.10f}")

# ---- DF-MP2 densities
pt = DFRMP2(mf).run()
print(f"DF-MP2                E_corr = {pt.e_corr:.10f}")
occ_u, _ = pt.make_natorbs(relaxed=False)
occ_r, _ = pt.make_natorbs(relaxed=True)
print(f"  natocc (unrelaxed)  {np.round(occ_u[:4], 6)}")
print(f"  natocc (relaxed)    {np.round(occ_r[:4], 6)}")

# ---- MP2-F12
aux = gto.M(atom=ATOM, basis="cc-pvdz-f12-optri", unit="angstrom")
ef12 = energy_f12(mf, aux, zeta=1.1, frozen=1)
print(f"MP2-F12/SP (fc)       dE = {ef12:.10f}")

# ---- CCSD + diagnostics
mf2 = RHF(mol)
mf2.conv_tol = 1e-12
mf2.kernel()
cc = RCCSDDriver(mf2).set(conv_tol=1e-10, conv_tol_normt=1e-8).run()
print(f"CCSD                  E_corr = {cc.e_corr:.10f}")
print(f"  T1 diag = {cc.get_t1_diagnostic():.5f}  "
      f"D1 = {cc.get_d1_diagnostic():.5f}  "
      f"D2 = {cc.get_d2_diagnostic():.5f}")

# ---- EOM roots
print(f"EE-EOM   lowest: {cc.eeccsd(nroots=2)[:2]}")
print(f"IP-EOM   lowest: {cc.ipccsd(nroots=2)[:2]}")
print(f"EA-EOM   lowest: {cc.eaccsd(nroots=2)[:2]}")
print(f"SF-EOM   lowest: {cc.eomsf_ccsd(nroots=1)[:1]}")

# ---- GF-CCSD
cc.solve_lambda()
gf = MomGFCCSD(cc, niter=(3, 3))
gf.kernel()
ips, wts = gf.ipgfccsd(nroots=2)
print(f"momGF-CCSD IP poles:  {np.round(ips, 6)} (weights "
      f"{np.round(wts, 3)})")
dm_gf = gf.make_rdm1()
dm_cc = np.asarray(cc.make_rdm1())
print(f"GF moment-0 rdm1 vs Lambda rdm1: max|diff| = "
      f"{np.abs(dm_gf - dm_cc).max():.2e}")
