#!/usr/bin/env python
"""(H2O)8 / cc-pVTZ certified on-device parity — the BASELINE gate at
full benchmark scale (SURVEY §7 risk (c), docs/PARITY.md).

Two-stage protocol (each stage its own subprocess so the JAX platform
choice is fresh):

  stage fp32 (TPU):  host fp64 SCF/DF (device-accelerated J/K), then
      fp32 ovvv-free DF-RCCSD + Lambda on the chip with true-fp32
      (3-pass) matmuls; dumps mo_coeff/fock and the converged fp32
      amplitudes.
  stage fp64 (CPU, x64):  rebuilds the IDENTICAL DF/MO integrals in
      fp64 from the saved mo_coeff/fock and evaluates the Lagrangian
      E_L = E(t32) + <l32, R(t32)> once.  Stationarity makes
      |E_L - E_exact| = O(|dt|^2 + |dl||dt|), so amplitudes converged
      to ~1e-5 certify the energy to ~1e-10 — no fp64 solve needed
      (a full fp64 CCSD at this scale is hours on one host core; the
      certification is one residual evaluation, ~minutes).

Reference analog: the fp64-everywhere path of pyscf/cc/ccsd.py — the
reference has no reduced-precision mode to certify; this script is the
evidence that the TPU fp32 pipeline meets the |dE| <= 1e-7 Ha gate the
reference meets by construction.

Run:  python examples/w8_parity_certify.py            # both stages
      python examples/w8_parity_certify.py --stage32  # TPU stage only
      python examples/w8_parity_certify.py --stage64  # host stage only
"""

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

# Checkpoints (SCF integrals + converged amplitudes/multipliers) default
# to a dir OUTSIDE .scratch — round 3 lost an 8900 s stage64 rerun when a
# machine restart wiped .scratch; .campaign/ is kept across rounds.
SCRATCH = os.environ.get(
    "W8_SCRATCH", os.path.join(_HERE, "..", ".campaign", "w8_parity"))
FROZEN = 8


def _lambda_ntile(nvir, base):
    """Ladder tile count for the Lambda/residual pass.  Round 3 doubled
    the forward tile count (smaller vjp pair blocks); the round-4 AOT
    memory sweep (tools/lambda_mem_probe.py) shows the step's peak is
    NOT the ladder segment once the t1 segment is split and the k-seeds
    are barrier-threaded — the forward tile count is the measured
    optimum (temp 7.50 GiB at ntile=8 vs 8.39 at 6/12/16 for (H2O)8)."""
    env = int(os.environ.get("W8_LAMBDA_NTILE", "0"))
    return env or min(max(base, 1), nvir)


def build_mf():
    """Deterministic (H2O)8/cc-pVTZ DF-RHF (host fp64 integrals)."""
    from w8_ccsd_pipeline import W8_GEOM
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF

    mol = gto.M(atom=W8_GEOM, basis="cc-pvtz")
    mf = RHF(mol).density_fit("cc-pvtz-jkfit")
    mf.conv_tol = 1e-10
    return mol, mf


def stage_fp32():
    import jax
    # certified path needs true-fp32 contractions (single-pass bf16
    # stalls the amplitudes at ~1e-4)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from pyscf_mpcc_tpu.cc import eris as eris_mod
    from pyscf_mpcc_tpu.cc import lambda_ad, rccsd
    from pyscf_mpcc_tpu.lib import memory as _mem

    t0 = time.time()
    scf_path = os.path.join(SCRATCH, "scf.npz")
    nelectron = None
    if "--reuse-scf" in sys.argv and os.path.exists(scf_path):
        # host SCF stage is deterministic; reuse it when iterating on the
        # device stage (e.g. after a TPU-worker restart)
        z = np.load(scf_path)
        mo_full, fock_ao, B = z["mo_full"], z["fock_ao"], z["B"]
        e_scf, nelectron = float(z["e_scf"]), int(z["nelectron"])
        print(f"[{time.time()-t0:7.1f}s] SCF reused: E = {e_scf:.10f}",
              flush=True)
    else:
        mol, mf = build_mf()
        mf.with_df.build()
        mf.kernel()  # host J/K: the device enters only for CCSD+Lambda
        print(f"[{time.time()-t0:7.1f}s] E(DF-RHF) = {mf.e_tot:.10f} "
              f"converged={mf.converged}", flush=True)
        assert mf.converged
        nelectron, e_scf = mol.nelectron, mf.e_tot
        mo_full = np.asarray(mf.mo_coeff)
        fock_ao = np.asarray(mf.get_fock(mf.make_rdm1()))
        B = np.asarray(mf.with_df.B_ao())
        os.makedirs(SCRATCH, exist_ok=True)
        np.savez(scf_path, mo_full=mo_full, fock_ao=fock_ao, B=B,
                 e_scf=e_scf, nelectron=nelectron)
    nocc = nelectron // 2 - FROZEN
    mo = mo_full[:, FROZEN:]

    er = eris_mod.make_eris_df(B, mo, fock_ao, nocc, dtype=jnp.float32,
                               keep_ovvv=False)
    nvir = er.Lvv.shape[1]
    # the governor plans the ladder tile from free HBM at call time, which
    # does not yet include the device DIIS ring — W8_NTILE overrides
    ntile = (int(os.environ.get("W8_NTILE", "0"))
             or _mem.plan_ladder_ntile(nocc, nvir, er.Lvv.shape[0]))
    print(f"[{time.time()-t0:7.1f}s] fp32 eris on device: nocc={nocc} "
          f"nvir={nvir} naux={er.Lvv.shape[0]} ntile={ntile}", flush=True)

    t_path = os.path.join(SCRATCH, "amps_t.npz")
    # DIIS placement: the on-device ring (2 x space x |t| = 1.5 GB per
    # space unit at this scale) eliminates the per-cycle amplitude
    # round-trip over the dev tunnel (80 s/cycle measured round 2;
    # ~9 min/cycle on a degraded tunnel observed round 3).  space=6 OOMs
    # next to the update working set on one 16 GB chip, but space=3 fits
    # and costs only a few extra cycles — at device speed that is minutes
    # vs hours.  Knobs keep the host ring available as the fallback.
    diis_backend = os.environ.get("W8_DIIS_BACKEND", "device")
    diis_space = int(os.environ.get("W8_DIIS_SPACE", "3"))
    # bf16 error ring for the forward device ring too (round 4): the
    # pair-mirrored ladder's working set no longer co-fits with a full
    # fp32 space-3 ring at this shape
    edtype = os.environ.get("W8_DIIS_ERR_DTYPE", "bfloat16")
    derr = getattr(jnp, edtype) if (diis_backend == "device" and edtype
                                    not in ("", "none")) else None
    if "--reuse-scf" in sys.argv and os.path.exists(t_path):
        zt = np.load(t_path)
        t1, t2 = jnp.asarray(zt["t1"]), jnp.asarray(zt["t2"])
        e32, conv = float(zt["e32"]), True
        print(f"[{time.time()-t0:7.1f}s] CCSD amps reused: "
              f"E_corr = {e32:.10f}", flush=True)
    else:
        # fp32 noise floor: with the space-3 device ring |dt| stalls at
        # ~5e-5 (space-6 host DIIS reaches 4e-7 but pays an 80 s/cycle
        # tunnel round-trip).  Stopping at |dt| ~ 1e-4 is exactly what the
        # Lagrangian protocol is for: E_L error = O(|dt|^2) ~ 1e-8.
        cconv = float(os.environ.get("W8_CONV", "1e-6"))
        cnormt = float(os.environ.get("W8_NORMT", "1.5e-4"))
        # preemption safety (host ring only): spill the DIIS ring every
        # cycle and resume from it — transient RESOURCE_EXHAUSTED on the
        # shared tunnel worker must not cost the whole multi-hour stage
        from pyscf_mpcc_tpu.lib.diis import DIIS as _DIIS
        spill = os.path.join(SCRATCH, "ccsd_diis.npz")
        adiis = (_DIIS.restore(spill)
                 if diis_backend == "host" and os.path.exists(spill)
                 else None)
        if adiis is not None:
            print(f"[{time.time()-t0:7.1f}s] resuming CCSD from DIIS spill "
                  f"({len(adiis._xs)} vectors)", flush=True)
        conv, e32, t1, t2 = rccsd.kernel(
            er, conv_tol=cconv, conv_tol_normt=cnormt,
            max_cycle=80, ntile=ntile, verbose=5,
            diis_backend=diis_backend, diis_space=diis_space,
            adiis=adiis, diis_err_dtype=derr,
            diis_file=spill if diis_backend == "host" else None)
        print(f"[{time.time()-t0:7.1f}s] fp32 E_corr(CCSD) = {e32:.10f} "
              f"converged={conv}", flush=True)
        assert conv
        np.savez(t_path, t1=np.asarray(t1), t2=np.asarray(t2), e32=e32)
    # certification error is <dl, R(t32)> ~ |dl||dt|: with |dt| ~ 1e-5,
    # lambda converged to even 1e-4 certifies below 1e-9 — the knobs let
    # a time-budgeted run stop the multiplier solve early
    lconv = float(os.environ.get("W8_LAMBDA_CONV", "1e-4"))
    lmax = int(os.environ.get("W8_LAMBDA_MAXCYC", "80"))
    # the Lambda vjp working set is larger than the forward update's, so
    # the Lambda ring defaults one notch smaller
    lspace = int(os.environ.get("W8_LAMBDA_DIIS_SPACE",
                                str(max(2, diis_space - 1))))
    lbackend = os.environ.get("W8_LAMBDA_DIIS_BACKEND", diis_backend)
    # bf16 error ring (lib/device_diis.init err_dtype): the round-4
    # default for the device Lambda ring — the fp32 ring did not co-fit
    # with the pair-ladder vjp at this shape (round 3)
    ledtype = os.environ.get("W8_LAMBDA_DIIS_ERR_DTYPE", "bfloat16")
    lerr = getattr(jnp, ledtype) if (lbackend == "device" and ledtype
                                     not in ("", "none")) else None
    from pyscf_mpcc_tpu.lib.diis import DIIS as _DIIS
    lspill = os.path.join(SCRATCH, "lambda_diis.npz")
    ladiis = (_DIIS.restore(lspill)
              if lbackend == "host" and os.path.exists(lspill) else None)
    if ladiis is not None:
        print(f"[{time.time()-t0:7.1f}s] resuming Lambda from DIIS spill "
              f"({len(ladiis._xs)} vectors)", flush=True)
    cl, l1, l2 = lambda_ad.kernel(t1, t2, er, conv_tol=lconv,
                                  max_cycle=lmax,
                                  ntile=_lambda_ntile(nvir, ntile),
                                  verbose=5, diis_backend=lbackend,
                                  diis_space=lspace, adiis=ladiis,
                                  diis_err_dtype=lerr,
                                  diis_file=lspill if lbackend == "host"
                                  else None)
    print(f"[{time.time()-t0:7.1f}s] lambda converged={cl}", flush=True)
    np.savez(os.path.join(SCRATCH, "amps.npz"),
             t1=np.asarray(t1), t2=np.asarray(t2),
             l1=np.asarray(l1), l2=np.asarray(l2))
    out = dict(stage="fp32", e32=float(e32), conv=bool(conv and cl),
               e_scf=e_scf, nocc=nocc, nvir=int(nvir),
               device=str(jax.devices()[0]), wall_s=round(time.time() - t0, 1))
    print("W8PARITY " + json.dumps(out), flush=True)


def stage_fp64():
    import jax
    # W8_STAGE64_BACKEND=ozaki keeps the TPU visible: the host (CPU
    # backend, fp64) evaluates the o^3v^3 remainder while the vvvv
    # ladder scalar runs on the int8 MXU at fp64 grade (ops/ozaki.py).
    backend = os.environ.get("W8_STAGE64_BACKEND", "host")
    if backend == "host":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from pyscf_mpcc_tpu.cc import eris as eris_mod
    from pyscf_mpcc_tpu.cc import lambda_ad

    t0 = time.time()

    def run():
        # EVERY host-side jit (the eris block builds + the residual
        # remainder) must stay on the CPU backend; only ops/ozaki ships
        # work to the TPU (it device_puts its digit arrays explicitly).
        # The first round-5 attempt built the o^2v^2 blocks on the
        # default (TPU) device and OOMed at 19.9 GiB in fp64.
        z = np.load(os.path.join(SCRATCH, "scf.npz"))
        nocc = int(z["nelectron"]) // 2 - FROZEN
        er = eris_mod.make_eris_df(
            z["B"], z["mo_full"][:, FROZEN:], z["fock_ao"], nocc,
            keep_ovvv=False,
            transform_backend="ozaki" if backend == "ozaki" else None)
        print(f"[{time.time()-t0:7.1f}s] fp64 eris "
              f"(transforms: {'int8 MXU' if backend == 'ozaki' else 'host'})",
              flush=True)
        a = np.load(os.path.join(SCRATCH, "amps.npz"))
        nvir = a["t1"].shape[1]
        from pyscf_mpcc_tpu.lib import memory as _mem
        nt64 = _mem.plan_ladder_ntile(nocc, nvir, z["B"].shape[0],
                                      dtype="float64", budget=48 * 2**30)
        amps = [jnp.asarray(a[k], jnp.float64)
                for k in ("t1", "t2", "l1", "l2")]
        kw = dict(ntile=nt64)
        if backend == "ozaki":
            kw.update(ladder_backend="ozaki",
                      oz_ntile=int(os.environ.get("W8_OZ_NTILE", "8")),
                      oz_s=int(os.environ.get("W8_OZ_S", "6")))
        return float(lambda_ad.lagrangian_energy(*amps, er, **kw))

    if backend == "ozaki":
        cpu = jax.devices("cpu")
        with jax.default_device(cpu[0]):
            e_lagr = run()
    else:
        e_lagr = run()
    out = dict(stage="fp64", e_lagr=e_lagr, backend=backend,
               wall_s=round(time.time() - t0, 1))
    print("W8PARITY " + json.dumps(out), flush=True)


def main():
    env = dict(os.environ)
    extra = [a for a in sys.argv[1:] if a == "--reuse-scf"]
    # wall budgets from the round-3 campaign: stage32 CCSD+Lambda ~4100 s
    # on a healthy tunnel (hours on a degraded one), stage64 ~8900 s on
    # this single-core host
    r32 = subprocess.run([sys.executable, __file__, "--stage32"] + extra,
                         env=env,
                         capture_output=True, text=True, timeout=6 * 3600)
    sys.stdout.write(r32.stdout)
    sys.stderr.write(r32.stderr[-2000:])
    if r32.returncode != 0:
        sys.exit(1)
    if env.get("W8_STAGE64_BACKEND", "host") == "host":
        env["JAX_PLATFORMS"] = "cpu"
    r64 = subprocess.run([sys.executable, __file__, "--stage64"], env=env,
                         capture_output=True, text=True, timeout=6 * 3600)
    sys.stdout.write(r64.stdout)
    sys.stderr.write(r64.stderr[-2000:])
    if r64.returncode != 0:
        sys.exit(1)
    d32 = d64 = None
    for line in (r32.stdout + r64.stdout).splitlines():
        if line.startswith("W8PARITY "):
            d = json.loads(line[len("W8PARITY "):])
            if d["stage"] == "fp32":
                d32 = d
            else:
                d64 = d
    delta = abs(d32["e32"] - d64["e_lagr"])
    print(json.dumps(dict(
        system="(H2O)8/cc-pVTZ frozen-core DF-RCCSD",
        nocc=d32["nocc"], nvir=d32["nvir"], device=d32["device"],
        e_corr_fp32_on_chip=d32["e32"],
        e_corr_fp64_lagrangian=d64["e_lagr"],
        # E_L approximates E_exact to O(|dt|^2) ~ 1e-10, so this delta IS
        # the raw fp32 on-chip error; the certified (production) number
        # is e_corr_fp64_lagrangian and meets the 1e-7 gate by the
        # stationarity argument whenever the fp32 solve converged.
        fp32_raw_dE=delta,
        converged=d32["conv"],
    )))


if __name__ == "__main__":
    if "--stage32" in sys.argv:
        stage_fp32()
    elif "--stage64" in sys.argv:
        stage_fp64()
    else:
        main()
