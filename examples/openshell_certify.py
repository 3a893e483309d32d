#!/usr/bin/env python
"""OH(H2O)3 / cc-pVDZ certified on-device OPEN-SHELL parity.

The spin-traced DF-UCCSD engine's first production evidence (VERDICT
round-3 item 7): a hydrogen-bonded radical cluster (doublet, 31
electrons) solved fp32 on the TPU — DF-UCCSD, unrestricted AD-Lambda,
and UCCSD(T) — then certified by ONE fp64 host evaluation of the CC
Lagrangian  E_L = E_HF + E_corr(t32) + <l32, R(t32)>.  Stationarity
makes |E_L - E_exact| = O(|dt|^2 + |dl||dt|), the same protocol as the
closed-shell (H2O)8 gate (examples/w8_parity_certify.py).

Reference analog: pyscf/cc/uccsd.py + uccsd_lambda.py run fp64
end-to-end; this script is the evidence the TPU fp32 open-shell path
meets the same |dE| <= 1e-7 Ha bar.

Run:  python examples/openshell_certify.py            # both stages
      python examples/openshell_certify.py --stage32  # TPU stage only
      python examples/openshell_certify.py --stage64  # host stage only
"""

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

BASIS = os.environ.get("OS_BASIS", "cc-pvdz")
# matched jkfit aux (the default 'weigend' universal-jfit is a J-only
# set, naux ~ 0.8 nao — fine for the pVDZ smoke certification, too thin
# to exercise the correlation envelope at pVTZ)
AUXBASIS = os.environ.get("OS_AUXBASIS",
                          BASIS + "-jkfit" if "pvtz" in BASIS else None)
# checkpoints outside .scratch (survive round restarts), one dir per basis
SCRATCH = os.environ.get(
    "OS_SCRATCH",
    os.path.join(_HERE, "..", ".campaign", "oh3w_parity_" + BASIS
                 + (("_" + AUXBASIS) if AUXBASIS else "")))

# OH radical donating to water A; waters B/C donating back to the
# radical oxygen (O-O ~ 2.75-2.9 A, no contacts under 0.93 A)
GEOM = (
    "O 0.0000 0.0000 0.0000; H 0.0000 0.0000 0.9700; "
    "O 0.0000 0.0000 2.8500; H 0.7583 0.0000 3.4387; "
    "H -0.7583 0.0000 3.4387; "
    "O 2.7500 0.0000 -0.6000; H 1.8121 0.0000 -0.3954; "
    "H 3.0689 0.8474 -0.2811; "
    "O -2.6000 0.9000 -0.7000; H -1.7208 0.5957 -0.4633; "
    "H -2.8768 0.0234 -0.4232"
)


def build_mf():
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import UHF
    mol = gto.M(atom=GEOM, basis=BASIS, spin=1)
    mf = UHF(mol).density_fit(AUXBASIS)
    mf.conv_tol = 1e-10
    return mol, mf


def _scf_arrays(reuse):
    import numpy as np
    scf_path = os.path.join(SCRATCH, "scf.npz")
    if reuse and os.path.exists(scf_path):
        z = np.load(scf_path)
        return (z["mo_a"], z["mo_b"], z["fa"], z["fb"], z["B"],
                float(z["e_scf"]), int(z["na"]), int(z["nb"]))
    mol, mf = build_mf()
    mf.with_df.build()
    mf.kernel()
    assert mf.converged
    dm = mf.make_rdm1()
    j, k = mf.get_jk(dm)
    h = mf.get_hcore()
    fa = h + j[0] + j[1] - k[0]
    fb = h + j[0] + j[1] - k[1]
    na, nb = mol.nelec
    out = (np.asarray(mf.mo_coeff[0]), np.asarray(mf.mo_coeff[1]),
           np.asarray(fa), np.asarray(fb), np.asarray(mf.with_df.B_ao()),
           float(mf.e_tot), na, nb)
    os.makedirs(SCRATCH, exist_ok=True)
    np.savez(scf_path, mo_a=out[0], mo_b=out[1], fa=out[2], fb=out[3],
             B=out[4], e_scf=out[5], na=na, nb=nb)
    return out


def stage_fp32():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from pyscf_mpcc_tpu.cc import lambda_ad, uccsd, uccsd_t

    t0 = time.time()
    mo_a, mo_b, fa, fb, B, e_scf, na, nb = _scf_arrays(
        "--reuse-scf" in sys.argv)
    print(f"[{time.time()-t0:7.1f}s] E(DF-UHF) = {e_scf:.10f}  "
          f"nelec=({na},{nb})  nao={mo_a.shape[0]}", flush=True)
    er = uccsd.make_eris_df(B, mo_a, mo_b, fa, fb, na, nb,
                            dtype=jnp.float32)
    print(f"[{time.time()-t0:7.1f}s] fp32 DF-UCCSD eris on device "
          f"(device={jax.devices()[0].platform})", flush=True)
    # on-device DIIS ring (host-solve hybrid): only scalars + the tiny
    # B system cross the dev tunnel per cycle
    diis_backend = os.environ.get("OS_DIIS_BACKEND", "device")
    conv, e32, t1, t2 = uccsd.kernel(er, conv_tol=1e-8,
                                     conv_tol_normt=1e-6,
                                     max_cycle=100, verbose=5,
                                     diis_backend=diis_backend)
    print(f"[{time.time()-t0:7.1f}s] fp32 E_corr(DF-UCCSD) = {e32:.10f} "
          f"converged={conv}", flush=True)
    assert conv
    convl, l1, l2 = lambda_ad.kernel_u(t1, t2, er, conv_tol=3e-6,
                                       max_cycle=60, verbose=5,
                                       diis_backend=diis_backend)
    print(f"[{time.time()-t0:7.1f}s] ulambda converged={convl}",
          flush=True)
    et = uccsd_t.kernel(t1, t2, er,
                        tile=int(os.environ.get("OS_TILE", "4")))
    print(f"[{time.time()-t0:7.1f}s] E(T)(UCCSD(T)) = {et:.10f}",
          flush=True)
    np.savez(os.path.join(SCRATCH, "amps.npz"),
             t1a=np.asarray(t1[0]), t1b=np.asarray(t1[1]),
             t2aa=np.asarray(t2[0]), t2ab=np.asarray(t2[1]),
             t2bb=np.asarray(t2[2]),
             l1a=np.asarray(l1[0]), l1b=np.asarray(l1[1]),
             l2aa=np.asarray(l2[0]), l2ab=np.asarray(l2[1]),
             l2bb=np.asarray(l2[2]), e32=e32, et=et)
    out = dict(stage="fp32", e32=float(e32), et=float(et),
               conv=bool(conv and convl), e_scf=e_scf,
               device=str(jax.devices()[0]),
               wall_s=round(time.time() - t0, 1))
    print("OSPARITY " + json.dumps(out), flush=True)


def stage_fp64():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from pyscf_mpcc_tpu.cc import lambda_ad, uccsd

    t0 = time.time()
    mo_a, mo_b, fa, fb, B, e_scf, na, nb = _scf_arrays(True)
    a = np.load(os.path.join(SCRATCH, "amps.npz"))
    # fp64 DF UERIs from the SAME factors — never materializes an nmo^4
    # tensor (the round-3 dense path needed 3 x nmo^4 fp64, which caps
    # out already at cc-pVTZ; lagrangian_energy_u is DF-factorized)
    er = uccsd.make_eris_df(B, mo_a, mo_b, fa, fb, na, nb)
    print(f"[{time.time()-t0:7.1f}s] fp64 DF-UCCSD eris on host "
          f"(nmo={mo_a.shape[1]})", flush=True)
    t1 = (jnp.asarray(a["t1a"], jnp.float64),
          jnp.asarray(a["t1b"], jnp.float64))
    t2 = tuple(jnp.asarray(a[k], jnp.float64)
               for k in ("t2aa", "t2ab", "t2bb"))
    l1 = (jnp.asarray(a["l1a"], jnp.float64),
          jnp.asarray(a["l1b"], jnp.float64))
    l2 = tuple(jnp.asarray(a[k], jnp.float64)
               for k in ("l2aa", "l2ab", "l2bb"))
    e_lagr = float(lambda_ad.lagrangian_energy_u(t1, t2, l1, l2, er))
    out = dict(stage="fp64", e_corr_lagr=e_lagr,
               e_corr_32=float(a["e32"]),
               abs_dE=abs(e_lagr - float(a["e32"])), et32=float(a["et"]),
               wall_s=round(time.time() - t0, 1))
    print("OSPARITY " + json.dumps(out), flush=True)


def main():
    env = dict(os.environ)
    extra = [x for x in sys.argv[1:] if x.startswith("--reuse")]
    r32 = subprocess.run([sys.executable, __file__, "--stage32"] + extra,
                         env=env)
    if r32.returncode:
        sys.exit(r32.returncode)
    r64 = subprocess.run([sys.executable, __file__, "--stage64"], env=env)
    sys.exit(r64.returncode)


if __name__ == "__main__":
    if "--stage32" in sys.argv:
        stage_fp32()
    elif "--stage64" in sys.argv:
        stage_fp64()
    else:
        main()
