#!/usr/bin/env python
"""Production-scale EOM-CCSD on the chip, reference-pinned: benzene /
cc-pVDZ (nocc=21, nvir=93).

Round-3 ran this as a literature-window check; round 4 pins it against
the reference fork's own numbers (docs/reference_pins.json — the
reference's eom_rccsd.py eeccsd:977 / ipccsd:291 / eaccsd:606 executed
on THIS host over integrals injected from our engine, so both sides see
bit-identical integrals).  To make the comparison exact, this run
matches the pin conditions: the same D6h geometry (R(CC)=1.392,
R(CH)=1.086), exact (non-DF) RHF, and exact incore MO integrals — the
only remaining differences are fp32 on-chip arithmetic and the Davidson
tolerance, so agreement <= 1e-3 eV is the pass bar.

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

# EXACT pin geometry (tools/pin_reference_values.py BENZENE)
GEOM = """
C    0.000000    1.392000    0.000000
C    1.205508    0.696000    0.000000
C    1.205508   -0.696000    0.000000
C    0.000000   -1.392000    0.000000
C   -1.205508   -0.696000    0.000000
C   -1.205508    0.696000    0.000000
H    0.000000    2.478000    0.000000
H    2.146012    1.239000    0.000000
H    2.146012   -1.239000    0.000000
H    0.000000   -2.478000    0.000000
H   -2.146012   -1.239000    0.000000
H   -2.146012    1.239000    0.000000
"""

REF = dict(  # docs/reference_pins.json benzene_ccpvdz
    rhf_e_tot=-230.72221627495318,
    ccsd_e_corr=-0.8364146647850237,
    ee_ev=[5.317611129002724, 6.8678031716863694,
           7.8784073251270375, 7.878407649536414],
    ip_ev=[9.115824420140703, 9.115829213763188, 11.951420976970022],
    ea_ev=[2.4231924553929907, 2.423195290706064, 3.866591229361914],
)


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.cc import eom, eris as eris_mod, rccsd
    from pyscf_mpcc_tpu.scf import RHF

    t0 = time.time()
    mol = gto.M(atom=GEOM, basis="cc-pvdz")
    mf = RHF(mol)           # exact J/K, like the pin run
    mf.conv_tol = 1e-11
    mf.kernel()
    assert mf.converged
    print(f"[{time.time()-t0:7.1f}s] E(RHF) = {mf.e_tot:.10f} "
          f"(ref {REF['rhf_e_tot']:.10f}, "
          f"d = {mf.e_tot - REF['rhf_e_tot']:.2e})", flush=True)

    nocc = mol.nelectron // 2
    eri_ao = gto.intor_eri(mol)
    fock_ao = np.asarray(mf.get_fock(mf.make_rdm1()))
    er = eris_mod.make_eris_incore(eri_ao, np.asarray(mf.mo_coeff),
                                   fock_ao, nocc, dtype=jnp.float32)
    nvir = er.fock.shape[0] - nocc
    print(f"[{time.time()-t0:7.1f}s] fp32 incore eris on device: "
          f"nocc={nocc} nvir={nvir} "
          f"(device={jax.devices()[0].platform})", flush=True)

    conv, e_corr, t1, t2 = rccsd.kernel(er, conv_tol=1e-8,
                                        conv_tol_normt=3e-6,
                                        max_cycle=100, verbose=5)
    d_ccsd = float(e_corr) - REF["ccsd_e_corr"]
    print(f"[{time.time()-t0:7.1f}s] fp32 E_corr(CCSD) = {e_corr:.10f} "
          f"converged={conv} (ref {REF['ccsd_e_corr']:.10f}, "
          f"d = {d_ccsd:.2e})", flush=True)
    assert conv

    results = {}
    for name, kern, nroots, ref in (
            ("ee", eom.kernel_ee, 4, REF["ee_ev"]),
            ("ip", eom.kernel_ip, 3, REF["ip_ev"]),
            ("ea", eom.kernel_ea, 3, REF["ea_ev"])):
        tb = time.time()
        convd, omegas, _ = kern(t1, t2, er, nroots=nroots, tol=1e-5,
                                max_cycle=150, verbose=5)
        evs = [float(w) * HARTREE_EV for w in np.atleast_1d(omegas)]
        derr = max(abs(a - b) for a, b in zip(evs, ref))
        results[name] = dict(roots_ev=[round(x, 5) for x in evs],
                             ref_ev=[round(x, 5) for x in ref],
                             max_abs_dev_ev=round(derr, 5),
                             davidson_converged=bool(np.all(convd)),
                             sec=round(time.time() - tb, 1))
        print(f"[{time.time()-t0:7.1f}s] {name.upper()}-EOM roots (eV): "
              + ", ".join(f"{x:.4f}" for x in evs)
              + f"  |dev vs reference| = {derr:.1e} eV", flush=True)

    out = dict(molecule="benzene/cc-pvdz (pin geometry)",
               nocc=nocc, nvir=int(nvir),
               e_scf=float(mf.e_tot), d_scf_vs_ref=float(mf.e_tot
                                                         - REF["rhf_e_tot"]),
               e_corr=float(e_corr), d_ccsd_vs_ref=d_ccsd,
               **results,
               device=str(jax.devices()[0]),
               wall_s=round(time.time() - t0, 1))
    print("EOMBENZENE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
