#!/usr/bin/env python
"""Benchmark: DF-RCCSD amplitude update at (H2O)8/cc-pVTZ scale.

Times the fused, jitted, ovvv-free DF update_amps (the framework's hot
kernel — reference counterpart: pyscf/cc/ccsd.py update_amps + _add_vvvv,
whose published CPU anchor is benzene/cc-pVTZ CCSD at 477 s total on a
2012 16-core Xeon, doc_legacy/source/benchmark.rst:44).

Problem shape: (H2O)8 / cc-pVTZ, frozen core — nocc=32, nvir=424,
naux=1216 (cc-pvtz-ri).  Synthetic DF tensors with physical scaling are
used so the bench is self-contained and starts in seconds; correctness of
the same kernel against reference energies is gated by tests/ (pinned to
1e-9 Ha on real molecules).

Prints ONE JSON line:
  metric: ccsd_update_tflops  — achieved TFLOP/s on the update (XLA flop count)
  vs_baseline: ratio to the reference CPU throughput implied by its own
  benzene/cc-pVTZ benchmark (477 s, ~14 iterations, _flops model
  pyscf/cc/ccsd.py:1754 -> ~0.11 TFLOP/s on 16 cores).
"""

from __future__ import annotations

import json
import time

import numpy as np


def reference_cpu_tflops():
    """CPU throughput implied by the reference's benzene/cc-pVTZ anchor."""
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
    n_iter = 14          # typical CCSD convergence
    total_s = 477.0      # doc_legacy/source/benchmark.rst:44 (16 cores)
    return n_iter * flops_iter / total_s / 1e12


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from pyscf_mpcc_tpu.cc import rccsd
    import __graft_entry__ as ge

    nocc, nvir, naux = 32, 424, 1216
    ntile = 106  # ladder tile buffer = (nvir/ntile)*nvir^3*4B ~ 1.2 GB
    dtype = jnp.float32
    eris = ge._synthetic_eris(nocc=nocc, nvir=nvir, naux=naux, dtype=dtype,
                              build_ovvv=False)
    _, t1, t2 = rccsd.init_amps(eris)

    fn = jax.jit(partial(rccsd.update_amps, ntile=ntile))
    lowered = fn.lower(t1, t2, eris)
    compiled = lowered.compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = None

    # warmup + timing
    o1, o2 = fn(t1, t2, eris)
    o1.block_until_ready()
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        o1, o2 = fn(t1, t2, eris)
    o1.block_until_ready()
    o2.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    if flops is None:
        # analytic fallback: dominant ladder + ring terms
        flops = (naux * nvir**4 * 2 + nocc**2 * nvir**4 * 2
                 + 8 * nocc**3 * nvir**3 * 2)
    tflops = flops / dt / 1e12
    ref = reference_cpu_tflops()
    print(json.dumps({
        "metric": "ccsd_update_tflops",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / ref, 2),
        "detail": {
            "sec_per_update": round(dt, 4),
            "nocc": nocc, "nvir": nvir, "naux": naux,
            "dtype": "float32",
            "device": str(jax.devices()[0]),
            "reference_cpu_tflops": round(ref, 4),
        },
    }))


if __name__ == "__main__":
    main()
