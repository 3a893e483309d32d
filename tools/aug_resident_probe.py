"""TPU AOT compile of the RESIDENT fused CCSD update at
(H2O)8/aug-cc-pVTZ shape (nocc=32, nvir=696, naux=1568, fp32).

The streamed single-chip path exists for exactly this shape; this probe
asks the real XLA:TPU compiler what the resident path would need — the
expected outcome is a compile-time HBM OOM ("Ran out of memory in
memory space hbm"), which together with lib/memory's model is the
on-record evidence that the shape exceeds one v5e resident
(docs/DESIGN.md capacity envelope; VERDICT r4 missing #5).

Usage: python tools/aug_resident_probe.py  (needs the TPU tunnel)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pyscf_mpcc_tpu.cc import rccsd
from pyscf_mpcc_tpu.cc.eris import RERIs

NOCC, NVIR, NAUX = 32, 696, 1568
NMO = NOCC + NVIR


def main():
    f32 = jnp.float32

    def S(shape):
        return jax.ShapeDtypeStruct(shape, f32)

    eris = RERIs(
        fock=S((NMO, NMO)), mo_energy=S((NMO,)),
        oooo=S((NOCC,) * 4), ovoo=S((NOCC, NVIR, NOCC, NOCC)),
        ovov=S((NOCC, NVIR, NOCC, NVIR)),
        oovv=S((NOCC, NOCC, NVIR, NVIR)),
        ovvo=None, ovvv=None, vvvv=None,
        Lov=S((NAUX, NOCC, NVIR)), Lvv=S((NAUX, NVIR, NVIR)),
        Loo=S((NAUX, NOCC, NOCC)),
    )
    t1 = S((NOCC, NVIR))
    t2 = S((NOCC, NOCC, NVIR, NVIR))
    ntile = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    t0 = time.time()
    try:
        compiled = jax.jit(
            lambda a, b, e: rccsd.update_amps(a, b, e, ntile=ntile)
        ).lower(t1, t2, eris).compile()
        m = compiled.memory_analysis()
        gib = 2.0 ** 30
        print(f"RESIDENT AOT ok [{time.time()-t0:.0f}s]: "
              f"temps={m.temp_size_in_bytes / gib:.2f} GiB "
              f"args={m.argument_size_in_bytes / gib:.2f} GiB")
    except Exception as ex:
        msg = str(ex)
        key = next((ln for ln in msg.splitlines()
                    if "Ran out of memory" in ln or "Exceeded" in ln),
                   msg.splitlines()[0] if msg else "?")
        print(f"RESIDENT AOT FAILS [{time.time()-t0:.0f}s]: "
              f"{key.strip()[:300]}")


if __name__ == "__main__":
    main()
