"""Micro-probes for the next (T) engine design ("resident": W dots inside
the Pallas kernel, per-A-cell (B,C)-plane batching, no W intermediates in
HBM).

Answers four questions the round-3 roofline left open:
  P1  true pallas_call dispatch cost (no tensor streams, SMEM-only)
  P2  VMEM capacity on this chip (scratch-allocation bisect)
  P3  in-kernel MXU rate at the design's dot shapes, DEFAULT precision
      ((256,424)x(424,8192) and (2048,424)x(424,1024))
  P4  resident-ref fetch rate: one call streaming 64 MB of constant-index
      BlockSpec inputs with trivial compute

Usage: python tools/triples_probe_v6.py [p1 p2 p3 p4]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

o, T, F, OO = 32, 8, 424, 1024


def fence(x):
    # value fetch: block_until_ready under-reports through the tunnel
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, n=20):
    fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    dt = (time.time() - t0) / n if fence(r) == r or True else 0
    return (time.time() - t0) / n


def p1_dispatch():
    """Empty kernel, grid (T,) then (T,T); one tiny SMEM input."""
    def kern(x_ref, out_ref):
        @pl.when((pl.program_id(0) == 0))
        def _():
            out_ref[0, 0] = x_ref[0, 0]

    for grid in [(T,), (T, T)]:
        f = pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
        x = jnp.ones((1, 1), jnp.float32)
        # chain 64 calls inside one jit to wash out python/tunnel overhead
        @jax.jit
        def chain(x, f=f):
            for _ in range(64):
                x = f(x)
            return x
        dt = timeit(chain, x, n=5)
        print(f"P1 dispatch grid={grid}: {dt / 64 * 1e3:.3f} ms/call",
              flush=True)


def p2_vmem():
    """Bisect the biggest VMEM scratch that compiles+runs."""
    def make(mb):
        n = mb * 1024 * 1024 // 4 // 1024

        def kern(x_ref, out_ref, scr):
            scr[0, :] = x_ref[0, :]
            out_ref[0, 0] = scr[0, 0]

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n, 1024), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=512 * 1024 * 1024))

    x = jnp.ones((8, 1024), jnp.float32)
    lo, hi = 16, 512
    while hi - lo > 4:
        mid = (lo + hi) // 2
        try:
            fence(make(mid)(x))
            lo = mid
        except Exception:
            hi = mid
    print(f"P2 VMEM scratch cap: ~{lo} MiB", flush=True)


def p3_dots():
    """In-kernel dot rates at the two design shapes, DEFAULT precision."""
    # shape A: (T*o, F) x (F, T*OO)  [cases x/y==a at fixed A]
    # shape B: (T*T*o, F) x (F, OO)  [case z==a]
    for (M, K, N, tag) in [(T * o, F, T * OO, "A"),
                           (T * T * o, F, OO, "B"),
                           (T * o, F, OO, "A1")]:
        def kern(a_ref, b_ref, out_ref, acc):
            # 6 dots per grid step emulating the per-A perm set
            a = a_ref[...]
            b = b_ref[...]
            r = jnp.zeros((M, 128), jnp.float32)
            for _ in range(6):
                w = jnp.dot(a, b, preferred_element_type=jnp.float32)
                r = r + w[:, :128]
            @pl.when(pl.program_id(0) == 0)
            def _():
                acc[...] = r
            @pl.when(pl.program_id(0) != 0)
            def _():
                acc[...] = acc[...] + r
            out_ref[0, 0] = acc[0, 0]

        f = pl.pallas_call(
            kern, grid=(T,),
            in_specs=[pl.BlockSpec((M, K), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=200 * 1024 * 1024))
        a = jnp.ones((M, K), jnp.float32)
        b = jnp.ones((K, N), jnp.float32)
        jf = jax.jit(f)
        dt = timeit(jf, a, b, n=10)
        fl = 2.0 * M * K * N * 6 * T
        print(f"P3 dot {tag} ({M}x{K})x({K}x{N}) x6 x{T}: "
              f"{dt * 1e3:.2f} ms = {fl / dt / 1e12:.1f} TFLOP/s", flush=True)


def p4_stream():
    """Constant-index resident refs: one call fetching 63 MB, trivial use."""
    t2 = jnp.ones((3, T, F, OO), jnp.float32)      # 41.7 MB
    ov = jnp.ones((6, T, T, o, F), jnp.float32)    # 20.8 MB

    def kern(t2_ref, ov_ref, out_ref):
        s = jnp.sum(t2_ref[0, 0, 0, :]) + jnp.sum(ov_ref[0, 0, 0, 0, :])
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[0, 0] = s

    f = pl.pallas_call(
        kern, grid=(T,),
        in_specs=[pl.BlockSpec((3, T, F, OO), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((6, T, T, o, F), lambda i: (0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=200 * 1024 * 1024))
    jf = jax.jit(f)
    dt = timeit(jf, t2, ov, n=10)
    mb = (t2.size + ov.size) * 4 / 2**20
    print(f"P4 resident fetch {mb:.0f} MB: {dt * 1e3:.2f} ms = "
          f"{mb / 1024 / dt:.0f} GB/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["p1", "p2", "p3", "p4"]
    print(f"device={jax.devices()[0]}", flush=True)
    for w in which:
        globals()[f"{w}_" + {"p1": "dispatch", "p2": "vmem", "p3": "dots",
                             "p4": "stream"}[w]]()
