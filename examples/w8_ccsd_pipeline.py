#!/usr/bin/env python
"""(H2O)8 / cc-pVTZ end-to-end pipeline — the headline benchmark system.

Full stack: native C++ integrals -> DF-RHF (device-accelerated J/K)
-> DF-RCCSD (ovvv-free, frozen core) -> tiled (T).
The setup (integrals + SCF) runs on the host; the correlation solve runs
on the default JAX device.  With --small, runs the (H2O)2/cc-pVDZ version
(minutes on CPU) for validation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# S4 cube arrangement of 8 waters (~2.7 A O-O edges), standard test cluster
W8_GEOM = []
import itertools
_r_oh = 0.9572
_ang = 104.52 * np.pi / 180.0
for idx, (i, j, k) in enumerate(itertools.product((0, 1), repeat=3)):
    O = np.array([2.7 * i, 2.7 * j, 2.7 * k])
    # alternate orientations
    s = 1.0 if (i + j + k) % 2 == 0 else -1.0
    h1 = O + _r_oh * np.array([s * np.sin(_ang / 2), np.cos(_ang / 2), 0.0])
    h2 = O + _r_oh * np.array([-s * np.sin(_ang / 2), np.cos(_ang / 2), 0.0])
    W8_GEOM += [["O", tuple(O)], ["H", tuple(h1)], ["H", tuple(h2)]]

W2_GEOM = [["O", (0.0, 0.0, 0.0)], ["H", (0.757, 0.587, 0.0)],
           ["H", (-0.757, 0.587, 0.0)],
           ["O", (0.0, 0.0, 2.98)], ["H", (0.757, 0.587, 2.98)],
           ["H", (-0.757, 0.587, 2.98)]]


def main(small=True):
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF
    from pyscf_mpcc_tpu.scf.hf import _JKDF
    from pyscf_mpcc_tpu.cc import CCSD

    t0 = time.time()
    basis = "cc-pvdz" if small else "cc-pvtz"
    geom = W2_GEOM if small else W8_GEOM
    frozen = 2 if small else 8
    mol = gto.M(atom=geom, basis=basis)
    print(f"[{time.time()-t0:7.1f}s] mol built: nao={mol.nao}")

    mf = RHF(mol).density_fit("weigend" if small else "cc-pvtz-jkfit")
    mf.with_df.build()
    print(f"[{time.time()-t0:7.1f}s] DF built: naux={mf.with_df.get_naoaux()}")
    if not small:
        mf._jk = _JKDF(mf.with_df.B_ao(), device=True)
    mf.conv_tol = 1e-10
    mf.kernel()
    print(f"[{time.time()-t0:7.1f}s] E(DF-RHF) = {mf.e_tot:.10f} "
          f"converged={mf.converged}")

    cc = CCSD(mf, frozen=frozen)
    cc.conv_tol = 1e-7
    e, t1, t2 = cc.kernel()
    print(f"[{time.time()-t0:7.1f}s] E_corr(DF-CCSD) = {e:.10f} "
          f"converged={cc.converged}")
    et = cc.ccsd_t(tile=8)
    print(f"[{time.time()-t0:7.1f}s] E(T) = {et:.10f}")
    print(f"total E = {mf.e_tot + e + et:.10f}")


if __name__ == "__main__":
    main(small="--full" not in sys.argv)
