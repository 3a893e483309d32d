#!/usr/bin/env python
"""Compile each Lambda-vjp segment separately at (H2O)8 shape and print
its temp footprint — locates the peak the segmented walk pays for."""
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

import jax
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc import eris as eris_mod
from pyscf_mpcc_tpu.cc import rccsd

SCRATCH = os.path.join(_HERE, "..", ".campaign", "w8_parity")
FROZEN = 8

z = np.load(os.path.join(SCRATCH, "scf.npz"))
nocc = int(z["nelectron"]) // 2 - FROZEN
er = eris_mod.make_eris_df(z["B"], z["mo_full"][:, FROZEN:], z["fock_ao"],
                           nocc, dtype=jnp.float32, keep_ovvv=False)
nvir = er.Lvv.shape[1]
print(f"eris nocc={nocc} nvir={nvir} naux={er.Lvv.shape[0]}", flush=True)

t1 = jnp.zeros((nocc, nvir), jnp.float32)
t2 = jnp.zeros((nocc, nocc, nvir, nvir), jnp.float32)
l1, l2 = jnp.array(t1), jnp.array(t2)

ntile = int(sys.argv[1]) if len(sys.argv) > 1 else 16

for name, (fn, kind) in [("seg_" + k, s) for k, s in zip(
        ["t1", "k_light", "ring_voov", "ring_vovo", "oooo", "ladder"],
        rccsd.residual_segments(er, ntile=ntile))]:
    def seg_vjp(t1_, t2_, ct1, ct2):
        _, vjp = jax.vjp(fn, t1_, t2_)
        return vjp(ct1 if kind == "r1" else ct2)
    ct1 = l1
    ct2 = l2
    try:
        comp = jax.jit(seg_vjp).lower(t1, t2, ct1, ct2).compile()
        ma = comp.memory_analysis()
        print(f"{name:>14} ntile={ntile}: temp={ma.temp_size_in_bytes/2**30:.2f}G "
              f"args={ma.argument_size_in_bytes/2**30:.2f}G "
              f"out={ma.output_size_in_bytes/2**30:.2f}G", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
