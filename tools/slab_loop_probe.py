"""Minimal Mosaic feasibility probe: fori_loop slab relayout.

Checks whether the resident (T) kernel's slab machinery can run as a
rolled jax.lax.fori_loop instead of a 32x python unroll (which OOMs the
remote Mosaic compile):
  (a) dynamic 32-lane read from a VMEM scratch: scr[..., pl.ds(jj*32, 32)]
  (b) dynamic non-minor store index: acc[:, :, jj] += slab
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

o, T = 32, 8


def kern(w_ref, out_ref, wscr, acc):
    # stage the fused value through scratch
    wscr[...] = w_ref[...]
    acc[...] = jnp.zeros((T, T, o, o, o), jnp.float32)

    def body(jj, _):
        slab = wscr[:, :, :, pl.ds(jj * o, o)]      # (T, o, T, 32)
        slab = jnp.transpose(slab, (0, 2, 1, 3))    # (T, T, o, 32)... ->
        acc[:, :, jj] += jnp.transpose(slab, (0, 1, 2, 3))
        return 0

    jax.lax.fori_loop(0, o, body, 0)
    out_ref[0, 0] = acc[0, 0, 0, 0, 0] + acc[1, 1, 1, 1, 1]


def main():
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, o, T, o * o), jnp.float32),
                        pltpu.VMEM((T, T, o, o, o), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024))
    w = jnp.arange(T * o * T * o * o, dtype=jnp.float32).reshape(
        T, o, T, o * o) * 1e-6
    t0 = time.time()
    r = jax.jit(f)(w)
    print(f"OK value={float(r[0, 0]):.6f} wall={time.time()-t0:.1f}s",
          flush=True)
    # expected: w[0,0,0,0] + w[1,1,1,1*32+1] after the transposes/places
    wv = w.reshape(T, o, T, o, o)
    exp = float(wv[0, 0, 0, 0, 0] + wv[1, 1, 1, 1, 1])
    print(f"expected={exp:.6f}", flush=True)


if __name__ == "__main__":
    main()
