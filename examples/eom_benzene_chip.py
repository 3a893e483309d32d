#!/usr/bin/env python
"""Production-scale EE-EOM-CCSD on the chip: benzene / cc-pVDZ.

The reference's own benchmark molecule (doc_legacy benchmark.rst:44;
nocc=21, nvir=93): host fp64 DF-RHF, fp32 DF-RCCSD on the TPU, then the
jvp-Jacobian EE-EOM sigma (cc/eom.py) under Davidson with root
following — the EOM family's first beyond-test-scale run.  The lowest
singlet (pi -> pi*, B2u) lands near its known ~5.1-5.3 eV EOM-CCSD/DZ
window; the value printed is the evidence record.

Run: python examples/eom_benzene_chip.py
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

HARTREE_EV = 27.211386245988

# D6h benzene, R(CC)=1.391 A, R(CH)=1.084 A
_atoms = []
for k in range(6):
    th = np.pi / 3 * k
    c, s = np.cos(th), np.sin(th)
    _atoms.append(f"C {1.391 * c:.6f} {1.391 * s:.6f} 0.0")
    _atoms.append(f"H {2.475 * c:.6f} {2.475 * s:.6f} 0.0")
GEOM = "; ".join(_atoms)


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.cc import eom, eris as eris_mod, rccsd
    from pyscf_mpcc_tpu.scf import RHF

    t0 = time.time()
    mol = gto.M(atom=GEOM, basis="cc-pvdz")
    mf = RHF(mol).density_fit()
    mf.conv_tol = 1e-10
    mf.with_df.build()
    mf.kernel()
    assert mf.converged
    print(f"[{time.time()-t0:7.1f}s] E(DF-RHF) = {mf.e_tot:.10f}",
          flush=True)
    nocc = mol.nelectron // 2
    B = np.asarray(mf.with_df.B_ao())
    fock_ao = np.asarray(mf.get_fock(mf.make_rdm1()))
    er = eris_mod.make_eris_df(B, np.asarray(mf.mo_coeff), fock_ao, nocc,
                               dtype=jnp.float32, keep_ovvv=False)
    nvir = er.Lvv.shape[1]
    print(f"[{time.time()-t0:7.1f}s] fp32 eris on device: nocc={nocc} "
          f"nvir={nvir} (device={jax.devices()[0].platform})", flush=True)
    conv, e_corr, t1, t2 = rccsd.kernel(er, conv_tol=1e-7,
                                        conv_tol_normt=3e-6,
                                        max_cycle=80, verbose=5)
    print(f"[{time.time()-t0:7.1f}s] fp32 E_corr(DF-CCSD) = "
          f"{e_corr:.10f} converged={conv}", flush=True)
    assert conv
    convd, omegas, _ = eom.kernel_ee(t1, t2, er, nroots=3, tol=3e-5,
                                     max_cycle=120, verbose=5)
    evs = [float(w) * HARTREE_EV for w in omegas]
    print(f"[{time.time()-t0:7.1f}s] EE-EOM roots (eV): "
          + ", ".join(f"{x:.4f}" for x in evs), flush=True)
    out = dict(molecule="benzene/cc-pvdz", nocc=nocc, nvir=int(nvir),
               e_scf=float(mf.e_tot), e_corr=float(e_corr),
               ee_roots_ev=[round(x, 4) for x in evs],
               davidson_converged=bool(np.all(convd)),
               device=str(jax.devices()[0]),
               wall_s=round(time.time() - t0, 1))
    print("EOMBENZENE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
