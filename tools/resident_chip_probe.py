"""On-chip probe of the resident (T) engine at bench shape.

Usage: python tools/resident_chip_probe.py [nprobe] [tile] [prec]
Compares ms/tile + TFLOP/s against the fused engine baseline
(round 3: fused 7.9 ms/tile default, 13.1 ms/tile dot-high).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

nprobe = int(sys.argv[1]) if len(sys.argv) > 1 else 64
tile = int(sys.argv[2]) if len(sys.argv) > 2 else 8
precs = sys.argv[3].split(",") if len(sys.argv) > 3 else ["high"]

import __graft_entry__ as ge
import pyscf_mpcc_tpu.cc.ccsd_t as M

nocc, nvir, naux = 32, 424, 1112
eris = ge._synthetic_eris(nocc=nocc, nvir=nvir, naux=naux,
                          dtype=jnp.float32, build_ovvv=False)
from pyscf_mpcc_tpu.cc import rccsd
_, t1, t2 = rccsd.init_amps(eris)
t0 = time.time()
print(f"[{time.time()-t0:6.1f}s] eris ready on {jax.devices()[0]}",
      flush=True)

nvp = ((nvir + tile - 1) // tile) * tile
orig = M._tile_triples
M._tile_triples = lambda nvt: orig(nvt)[:nprobe]
ntiles_full = orig(nvp // tile).shape[0]
fpt = (2 * 6 * tile**3 * nocc**3 * nvp + 2 * 6 * tile**3 * nocc**4
       + 2 * 6 * naux * nocc * tile * nvp * tile)

for prec in precs:
    kw = dict(tile=tile, tiles_per_call=nprobe, engine="resident",
              dot_precision=None if prec == "none" else prec)
    try:
        e = M.kernel(t1, t2, eris, **kw)
        print(f"[{time.time()-t0:6.1f}s] compile+warm done "
              f"e={e:.6f}", flush=True)
        t1_ = time.time()
        e = M.kernel(t1, t2, eris, **kw)
        dt = time.time() - t1_
        print(f"resident prec={prec} nprobe={nprobe} tile={tile}: "
              f"{dt:.3f}s = {dt / nprobe * 1e3:.2f} ms/tile, "
              f"{fpt * nprobe / dt / 1e12:.1f} TFLOP/s, "
              f"est full {dt / nprobe * ntiles_full:.0f}s", flush=True)
    except Exception as ex:
        import traceback
        traceback.print_exc()
        print(f"resident prec={prec}: FAILED {type(ex).__name__}",
              flush=True)
