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

# Hydrogen-bonded cubic (H2O)8 (the standard cube-cluster motif): O on a
# 2.8 A cube, each of the 12 edges carries exactly one O-H...O hydrogen
# bond (donor assignment by backtracking; 4 double-donor + 4 single-donor
# waters, free H of single donors pointing outward).  All intermolecular
# contacts physical (min H...O 1.84 A = the H-bonds, min H-H 2.08 A) —
# the earlier non-bonded orientation had 1.2 A H-H clashes that stalled
# SCF convergence.
import itertools

_A = 2.8
_r_oh = 0.9572
_ang = 104.52 * np.pi / 180.0


def _w8_cube():
    corners = list(itertools.product((0, 1), repeat=3))
    edges = []
    for c in corners:
        for ax in range(3):
            n = list(c)
            n[ax] ^= 1
            n = tuple(n)
            if c < n:
                edges.append((c, n))
    don = {c: 0 for c in corners}
    choice = []

    def solve(i):
        if i == len(edges):
            return all(v in (1, 2) for v in don.values())
        u, v = edges[i]
        for d in (u, v):
            if don[d] < 2:
                don[d] += 1
                choice.append(d)
                if solve(i + 1):
                    return True
                don[d] -= 1
                choice.pop()
        return False

    assert solve(0)
    center = np.full(3, 0.5) * _A
    geom = []
    for c in corners:
        O = np.array(c, float) * _A
        dirs = [(np.array(v if u == c else u, float) * _A - O) / _A
                for i, (u, v) in enumerate(edges) if choice[i] == c]
        if len(dirs) == 1:
            e1 = dirs[0]
            out = O - center
            out /= np.linalg.norm(out)
            e2 = out - (out @ e1) * e1
            e2 /= np.linalg.norm(e2)
            dirs.append(np.cos(_ang) * e1 + np.sin(_ang) * e2)
        geom.append(["O", tuple(O)])
        geom += [["H", tuple(O + _r_oh * d)] for d in dirs]
    return geom


W8_GEOM = _w8_cube()

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
