#!/usr/bin/env python
"""Compile (not run) the (H2O)8 Lambda step on the TPU and print XLA's
memory analysis — temp vs argument vs output bytes — so HBM-fit work is
driven by measurement (docs/PARITY.md round-4 Lambda wall item)."""
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
from pyscf_mpcc_tpu.cc import lambda_ad

SCRATCH = os.path.join(_HERE, "..", ".campaign", "w8_parity")
FROZEN = 8

t0 = time.time()
z = np.load(os.path.join(SCRATCH, "scf.npz"))
nocc = int(z["nelectron"]) // 2 - FROZEN
er = eris_mod.make_eris_df(z["B"], z["mo_full"][:, FROZEN:], z["fock_ao"],
                           nocc, dtype=jnp.float32, keep_ovvv=False)
nvir = er.Lvv.shape[1]
print(f"[{time.time()-t0:6.1f}s] eris nocc={nocc} nvir={nvir} "
      f"naux={er.Lvv.shape[0]}", flush=True)

t1 = jnp.zeros((nocc, nvir), jnp.float32)
t2 = jnp.zeros((nocc, nocc, nvir, nvir), jnp.float32)
l1 = jnp.array(t1)
l2 = jnp.array(t2)

for ntile in (int(a) for a in sys.argv[1:] or ["16"]):
    lowered = jax.jit(
        lambda_ad._lambda_step.__wrapped__,
        static_argnames=("ntile",),
        donate_argnums=(0, 1)).lower(l1, l2, t1, t2, er, ntile=ntile)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    print(f"ntile={ntile}: {ma}", flush=True)
