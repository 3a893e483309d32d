#!/usr/bin/env python
"""Benchmark: DF-RCCSD amplitude update at (H2O)8/cc-pVTZ scale.

Times the fused, jitted, ovvv-free DF update_amps — the framework's hot
kernel (reference counterpart: pyscf/cc/ccsd.py update_amps + _add_vvvv,
whose published CPU anchor is benzene/cc-pVTZ CCSD at 477 s total on a
2012 16-core Xeon; doc_legacy/source/benchmark.rst:44).

Problem shape ladder (first that fits/completes wins):
  (H2O)8 / cc-pVTZ frozen-core: nocc=32, nvir=424, naux=1216
  half scale:                   nocc=24, nvir=212, naux=608
  quarter scale:                nocc=16, nvir=128, naux=384
Synthetic DF tensors are generated ON DEVICE (tunnel transfers are slow);
correctness of the same kernel against reference energies is gated by
tests/ (pinned to 1e-9 Ha on real molecules).

Each attempt runs in a subprocess with a hard timeout so a wedged device
cannot hang the driver.  Prints ONE JSON line:
  metric ccsd_update_tflops; vs_baseline = ratio to the reference CPU
  throughput implied by its own benzene benchmark (~0.11 TFLOP/s).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CONFIGS = [
    dict(nocc=32, nvir=424, naux=1216, ntile=106, timeout=560),
    dict(nocc=24, nvir=212, naux=608, ntile=53, timeout=300),
    dict(nocc=16, nvir=128, naux=384, ntile=16, timeout=200),
    dict(nocc=8, nvir=64, naux=128, ntile=8, timeout=150),
    # last resort: CPU backend, so a wedged accelerator still yields a
    # meaningful (if slow) measurement instead of an error record
    dict(nocc=8, nvir=64, naux=128, ntile=8, timeout=300, platform="cpu"),
]


def reference_cpu_tflops():
    nocc, nvir = 21, 243
    flops_iter = (
        nocc**3 * nvir**2 * 2 + nocc**2 * nvir**3 * 2
        + nocc**4 * nvir * 4 + nocc**4 * nvir**2 * 2
        + nocc * nvir**4 * 4
        + nocc**2 * nvir**3 * 2 + nocc**3 * nvir**2 * 2
        + nocc**3 * nvir**3 * 4
        + nocc**2 * nvir**3 * 4 + nocc**3 * nvir**2 * 6
        + nocc * (nocc + 1) / 2 * nvir**4 * 2
        + nocc**3 * nvir**3 * 6 + nocc**4 * nvir**2 * 2)
    n_iter = 14
    total_s = 477.0
    return n_iter * flops_iter / total_s / 1e12


def run_config(cfg):
    """Executed in the child process: measure one configuration."""
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from functools import partial
    from pyscf_mpcc_tpu.cc import rccsd
    import __graft_entry__ as ge

    nocc, nvir, naux = cfg["nocc"], cfg["nvir"], cfg["naux"]
    eris = ge._synthetic_eris(nocc=nocc, nvir=nvir, naux=naux,
                              dtype=jnp.float32, build_ovvv=False)
    jax.block_until_ready(eris.Lvv)
    _, t1, t2 = rccsd.init_amps(eris)
    fn = jax.jit(partial(rccsd.update_amps, ntile=cfg["ntile"]))
    compiled = fn.lower(t1, t2, eris).compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = float(naux * nvir**4 * 2 + nocc**2 * nvir**4 * 2
                      + 8 * nocc**3 * nvir**3 * 2)
    t1b, t2b = fn(t1, t2, eris)
    # NOTE: on the axon tunnel runtime block_until_ready can return before
    # execution finishes; a scalar device->host fetch is the only reliable
    # synchronization point.
    chk = float(jnp.vdot(t1b, t1b))
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        t1b, t2b = fn(t1b, t2b, eris)
    chk = float(jnp.vdot(t1b, t1b))
    dt = (time.perf_counter() - t0) / n_rep
    return dict(flops=flops, sec=dt, device=str(jax.devices()[0]), chk=chk)


def _device_alive(timeout=45):
    """Probe the accelerator in a subprocess (a wedged device hangs)."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        cfg = json.loads(sys.argv[2])
        out = run_config(cfg)
        print("RESULT:" + json.dumps(out), flush=True)
        return

    # The dev-tunnel TPU worker restarts take tens of minutes after a crash;
    # wait (bounded) for it instead of burning the shape ladder's timeouts.
    deadline = time.time() + 1500
    while not _device_alive() and time.time() < deadline:
        time.sleep(60)

    ref = reference_cpu_tflops()
    for cfg in CONFIGS:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 json.dumps(cfg)],
                capture_output=True, text=True, timeout=cfg["timeout"],
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT:"):
                    r = json.loads(line[len("RESULT:"):])
                    tflops = r["flops"] / r["sec"] / 1e12
                    print(json.dumps({
                        "metric": "ccsd_update_tflops",
                        "value": round(tflops, 3),
                        "unit": "TFLOP/s",
                        "vs_baseline": round(tflops / ref, 2),
                        "detail": {
                            "sec_per_update": round(r["sec"], 4),
                            "nocc": cfg["nocc"], "nvir": cfg["nvir"],
                            "naux": cfg["naux"], "dtype": "float32",
                            "device": r["device"],
                            "reference_cpu_tflops": round(ref, 4),
                        },
                    }))
                    return
        except subprocess.TimeoutExpired:
            continue
        except Exception:
            continue
    print(json.dumps({
        "metric": "ccsd_update_tflops", "value": 0.0, "unit": "TFLOP/s",
        "vs_baseline": 0.0,
        "detail": {"error": "no configuration completed (device unavailable)"},
    }))


if __name__ == "__main__":
    main()
