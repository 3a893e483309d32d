"""AOT memory analysis of the (H2O)8-scale Lambda step.

Compiles cc/lambda_ad._lambda_step at production shape (nocc=32,
nvir=424, naux=1112, fp32) WITHOUT uploading any data, and prints XLA's
memory_analysis() for each candidate configuration — the temp budget
that must co-fit with the resident eris + amplitudes + DIIS ring on one
16 GB v5e.  Replaces the run-and-OOM iteration loop (stage32a..h) with
one compile sweep.

Usage:  python tools/lambda_mem_probe.py [ntile ...]
Env:    LMEM_STREAM=1 probe the host-streamed-Lvv eris variant too.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pyscf_mpcc_tpu.cc import lambda_ad
from pyscf_mpcc_tpu.cc.eris import RERIs

NOCC, NVIR, NAUX = 32, 424, 1112
NMO = NOCC + NVIR


def abstract_eris(stream=False):
    f32 = jnp.float32
    S = jax.ShapeDtypeStruct
    return RERIs(
        fock=S((NMO, NMO), f32),
        mo_energy=S((NMO,), f32),
        oooo=S((NOCC,) * 4, f32),
        ovoo=S((NOCC, NVIR, NOCC, NOCC), f32),
        ovov=S((NOCC, NVIR, NOCC, NVIR), f32),
        oovv=S((NOCC, NOCC, NVIR, NVIR), f32),
        ovvo=None, ovvv=None, vvvv=None,
        Lvv=None if stream else S((NAUX, NVIR, NVIR), f32),
        Lov=S((NAUX, NOCC, NVIR), f32),
        Loo=S((NAUX, NOCC, NOCC), f32),
        Lvv_stream=S((), jnp.int32) if stream else None,
    )


def probe(ntile, stream):
    S = jax.ShapeDtypeStruct
    f32 = jnp.float32
    l1 = S((NOCC, NVIR), f32)
    l2 = S((NOCC, NOCC, NVIR, NVIR), f32)
    er = abstract_eris(stream)
    t0 = time.time()
    try:
        lowered = lambda_ad._lambda_step.lower(
            l1, l2, l1, l2, er, ntile=ntile,
            err_dtype=os.environ.get("LMEM_ERRDT") or None)
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        gib = 2.0 ** 30
        print(f"ntile={ntile:3d} stream={int(stream)}  "
              f"temp={m.temp_size_in_bytes / gib:7.2f} GiB  "
              f"args={m.argument_size_in_bytes / gib:6.2f}  "
              f"out={m.output_size_in_bytes / gib:5.2f}  "
              f"alias={m.alias_size_in_bytes / gib:5.2f}  "
              f"[{time.time() - t0:.0f}s]", flush=True)
    except Exception as e:  # compile-time OOM raises too
        msg = str(e).splitlines()[0][:200]
        print(f"ntile={ntile:3d} stream={int(stream)}  FAILED {msg}  "
              f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    ntiles = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    print(f"device={jax.devices()[0]}", flush=True)
    for nt in ntiles:
        probe(nt, False)
    if os.environ.get("LMEM_STREAM"):
        for nt in ntiles:
            probe(nt, True)
