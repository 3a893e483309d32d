#!/usr/bin/env python
"""Full production CCSD(T) at (H2O)8/cc-pVTZ (frozen core) on one TPU chip.

Runs the complete perturbative-triples correction — every (a >= b >= c)
tile of the 424-virtual space, 26k tiles — from the converged fp32
amplitude checkpoint written by examples/w8_parity_certify.py --stage32.
This is the production-scale evidence for the tiled (T) engine
(cc/ccsd_t.py + ops/triples_combine.py; reference counterpart:
pyscf/cc/ccsd_t.py:34 driving lib/cc/ccsd_t.c:378, whose OpenMP
(a,b,c)-triple loop this replaces with an MXU tile scan + Pallas
permutation epilogue).

Usage:  python examples/w8_triples_chip.py [runs] [tile]
        runs: comma list of engine:precision combos, e.g.
              "fused:dot-high,fused:highest" (default "fused:dot-high");
              engine in {fused, xla} ('fused' is the grid-batched chunk
              path), precision in {default, highest, dot-high,
              dot-highest}
        One process runs every combo — the eris build over the dev
        tunnel (~10 min) is paid once.

Precision: the W-building dots run on the MXU, whose native multiply is
bf16.  A one-shot energy has no iteration to clean rounding, so the
production number uses 'highest' (true-fp32 contract precision); note
Mosaic lowers only DEFAULT and HIGHEST for in-kernel dots ('high'
raises at trace time).  Running both 'highest' and 'default' in one
invocation measures the precision cost AND certifies how much the
cheap-precision energy deviates.  docs/PARITY.md records the results.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import ccsd_t
from pyscf_mpcc_tpu.cc import eris as eris_mod

SCRATCH = os.environ.get(
    "W8_SCRATCH", os.path.join(_HERE, "..", ".campaign", "w8_parity"))
FROZEN = 8


def main():
    runs = (sys.argv[1] if len(sys.argv) > 1 else "fused:dot-high").split(",")
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    t0 = time.time()
    z = np.load(os.path.join(SCRATCH, "scf.npz"))
    nocc = int(z["nelectron"]) // 2 - FROZEN
    er = eris_mod.make_eris_df(z["B"], z["mo_full"][:, FROZEN:],
                               z["fock_ao"], nocc, dtype=jnp.float32,
                               keep_ovvv=False)
    print(f"[{time.time()-t0:7.1f}s] eris on device", flush=True)
    a = np.load(os.path.join(SCRATCH, "amps_t.npz"))
    t1 = jnp.asarray(a["t1"], jnp.float32)
    t2 = jnp.asarray(a["t2"], jnp.float32)
    print(f"[{time.time()-t0:7.1f}s] amps loaded: E_corr(CCSD) = "
          f"{float(a['e32']):.10f}", flush=True)
    for spec in runs:
        engine, _, precision = spec.partition(":")
        precision = precision or "highest"
        # 'dot-high'/'dot-highest' use the per-dot kwarg (XLA-side W dots
        # at that precision, in-kernel w2 dots at HIGHEST) instead of the
        # global flag — the production sweet spot is 'dot-high' (bf16x3)
        dot_prec = precision[4:] if precision.startswith("dot-") else None
        jax.config.update(
            "jax_default_matmul_precision",
            None if (dot_prec or precision == "default") else precision)
        t_start = time.time()
        try:
            et = ccsd_t.kernel(t1, t2, er, tile=tile, engine=engine,
                               dot_precision=dot_prec,
                               chunk=int(os.environ.get("W8T_CHUNK", "1")))
        except Exception as ex:
            print("W8TRIPLES " + json.dumps(dict(
                engine=engine, precision=precision,
                error=f"{type(ex).__name__}")), flush=True)
            continue
        wall = time.time() - t_start
        out = dict(system="(H2O)8/cc-pVTZ frozen-core", engine=engine,
                   tile=tile, precision=precision,
                   e_ccsd_corr=float(a["e32"]), e_t=float(et),
                   wall_T_sec=round(wall, 1), device=str(jax.devices()[0]))
        print("W8TRIPLES " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
