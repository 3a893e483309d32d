"""Probe the TPU runtime's precision/dtype envelope for the fp64
certification offload (VERDICT r4 weak #5).

Questions, in order:
 1. does the runtime execute f64 ops at all (if yes, the whole
    stage64 Lagrangian can just run on device)?
 2. int8 x int8 -> int32 dot_general (the exact-accumulation Ozaki
    path: 7-bit mantissa slices, products <= 2^14, int32 exact for
    131k-term contractions) — supported? throughput?
 3. bf16 x bf16 -> f32 dot throughput (the fallback Ozaki path:
    8-bit slices, 256-term exact accumulation chunks)
 4. f32(HIGHEST) dot throughput baseline for the same shape.

Usage: python tools/device_prec_probe.py   (on the axon TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def bench_dot(a, b, pet=None, precision=None, n=20, warm=3):
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=pet, precision=precision))
    out = f(a, b)
    out.block_until_ready()
    for _ in range(warm - 1):
        f(a, b).block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = f(a, b)
    out.block_until_ready()
    dt = (time.time() - t0) / n
    ops = 2.0 * a.shape[0] * a.shape[1] * b.shape[1]
    return dt, ops / dt / 1e12, out


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # 1. f64
    try:
        jax.config.update("jax_enable_x64", True)
        a = jnp.asarray(np.random.rand(256, 256))
        r = jnp.dot(a, a)
        r.block_until_ready()
        print("f64 dot: OK dtype=", r.dtype)
        if r.dtype == jnp.float64:
            a = jnp.asarray(np.random.rand(4096, 4096))
            dt, tf, _ = bench_dot(a, a)
            print(f"f64 4096^3: {dt*1e3:.1f} ms  {tf:.2f} TFLOP/s")
    except Exception as e:
        print("f64 dot: UNSUPPORTED —", str(e).splitlines()[0])
    finally:
        jax.config.update("jax_enable_x64", False)

    M = K = N = 4096
    rng = np.random.default_rng(0)

    # 2. int8 -> int32
    try:
        ai = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
        bi = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
        dt, tops, out = bench_dot(ai, bi, pet=jnp.int32)
        ok = out.dtype == jnp.int32
        # exactness check vs numpy on a slice
        ref = (np.asarray(ai[:64], np.int64) @ np.asarray(bi[:, :64], np.int64))
        got = np.asarray(out[:64, :64], np.int64)
        print(f"int8->int32 dot: dtype={out.dtype} exact={np.array_equal(ref, got)}"
              f"  {dt*1e3:.2f} ms  {tops:.1f} TOP/s")
    except Exception as e:
        print("int8->int32 dot: UNSUPPORTED —", str(e).splitlines()[0])

    # 3. bf16 -> f32
    try:
        ab = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        bb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        dt, tf, out = bench_dot(ab, bb, pet=jnp.float32)
        print(f"bf16->f32 dot: dtype={out.dtype}  {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s")
    except Exception as e:
        print("bf16->f32 dot: UNSUPPORTED —", str(e).splitlines()[0])

    # 4. f32 HIGHEST baseline
    af = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    bf = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    dt, tf, _ = bench_dot(af, bf, precision=jax.lax.Precision.HIGHEST)
    print(f"f32 HIGHEST dot: {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s")
    dt, tf, _ = bench_dot(af, bf, precision=jax.lax.Precision.DEFAULT)
    print(f"f32 DEFAULT dot: {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
