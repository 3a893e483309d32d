#!/usr/bin/env python
"""Fragmented unrestricted MP-CC workflow at production scale on the chip.

The fork's FLAGSHIP pipeline (SURVEY section 3.3; reference
examples/cc/44-mpcc/n2_rohf_umpccsd.py fragmented_mpcc_unrestricted):
per-spin Pipek-Mezey localization, non-canonical iterative UMP2 bath in
the localized basis, then per-fragment UMPCC solves chaining (t1, t2) —
here on a real radical cluster, OH(H2O)3 / cc-pVDZ (39 e-, nmo=91),
with the amplitude solves running fp32 on the TPU.

Fragments: the OH radical and each water, solved radical-first so the
open-shell fragment relaxes against the MP2 bath of the waters, then
the waters refine while the radical's blocks stay frozen — the fork's
chained-fragment semantics.

Host fp64: SCF, localization, ERI build.  Device fp32: the iterative
UMP2 bath and every UMPCC fragment solve (the workflow inherits the
session backend; x64 stays off so amplitudes are fp32 on the TPU).

Run:  python examples/mpcc_fragmented_chip.py
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

GEOM = (
    "O 0.0000 0.0000 0.0000; H 0.0000 0.0000 0.9700; "
    "O 0.0000 0.0000 2.8500; H 0.7583 0.0000 3.4387; "
    "H -0.7583 0.0000 3.4387; "
    "O 2.7500 0.0000 -0.6000; H 1.8121 0.0000 -0.3954; "
    "H 3.0689 0.8474 -0.2811; "
    "O -2.6000 0.9000 -0.7000; H -1.7208 0.5957 -0.4633; "
    "H -2.8768 0.0234 -0.4232"
)
# atom indices per fragment: OH radical, then the three waters.
# MPCC_FRAGMENTS=radical solves ONLY the radical fragment at the CC
# level (waters stay at their iterative-UMP2 bath values) — the fork's
# actual use-case; the default chains all four fragments.
# Measured on the chip (2026-08-18, MPCCSD(4,2) variant): radical-only
# recovers 29.9% of the MP2->CCSD gap, the chained four-fragment run
# 94.1%, and the no-freeze control (idx_s=idx_d=[]) reproduces global
# CCSD exactly — the fraction ladder that validates the freeze
# semantics end to end.
if os.environ.get("MPCC_FRAGMENTS") == "radical":
    FRAGMENTS = [[0, 1]]
else:
    FRAGMENTS = [[0, 1], [2, 3, 4], [5, 6, 7], [8, 9, 10]]


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.cc import uccsd
    from pyscf_mpcc_tpu.mpcc import workflow
    from pyscf_mpcc_tpu.scf import UHF

    t0 = time.time()
    mol = gto.M(atom=GEOM, basis="cc-pvdz", spin=1)
    mf = UHF(mol)
    mf.conv_tol = 1e-10
    mf.kernel()
    assert mf.converged
    print(f"[{time.time()-t0:7.1f}s] E(UHF) = {mf.e_tot:.10f}", flush=True)
    eri_ao = gto.intor_eri(mol)
    print(f"[{time.time()-t0:7.1f}s] host ERIs built "
          f"(nao={mol.nao})", flush=True)

    # MPCCSD(4,2)-style variant: all four singles blocks relax, doubles
    # relax only on the all-active block (blocks 0..14 frozen to the MP2
    # bath) — the reference example's standard setting
    idx_s, idx_d = [], list(range(15))
    e_mpcc, t1, t2, c_loc, spaces = workflow.fragmented_mpcc_unrestricted(
        mol, mf, FRAGMENTS, idx_s, idx_d, eri_ao=eri_ao, verbose=5,
        mp2_conv=1e-8, cc_conv=1e-6)
    wall = time.time() - t0
    print(f"[{wall:7.1f}s] fragmented UMPCC E_corr = {e_mpcc:.10f}",
          flush=True)

    # global references on the same (localized-basis) eris
    na, nb = mol.nelec
    focka, fockb = np.asarray(mf.get_fock(mf.make_rdm1()))
    er = uccsd.make_eris_incore(eri_ao, c_loc[0], c_loc[1], focka, fockb,
                                na, nb)
    from pyscf_mpcc_tpu.mp import ump2
    e_mp2, _, _ = ump2.iterative_kernel(er, conv_tol=1e-8, max_cycle=200)
    conv_g, e_ccsd, *_ = uccsd.kernel(er, conv_tol=1e-6,
                                      conv_tol_normt=2e-4, max_cycle=80)
    frac = (float(e_mpcc) - float(e_mp2)) / (float(e_ccsd) - float(e_mp2))
    out = dict(system="OH(H2O)3/cc-pVDZ", fragments=FRAGMENTS,
               n_spaces=[[len(s) for s in sp] for sp in spaces]
               if spaces else None,
               e_corr_mp2=float(e_mp2), e_corr_mpcc=float(e_mpcc),
               e_corr_ccsd=float(e_ccsd), ccsd_converged=bool(conv_g),
               mpcc_fraction_of_ccsd_vs_mp2=round(frac, 4),
               device=str(jax.devices()[0]),
               wall_workflow_sec=round(wall, 1),
               wall_s=round(time.time() - t0, 1))
    print("MPCCFRAG " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
