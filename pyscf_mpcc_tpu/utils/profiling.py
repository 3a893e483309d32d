"""Tracing / utilization reporting.

Role of the reference's observability layer (SURVEY.md section 5:
logger.timer threading + the analytic _flops model printed at DEBUG1):
wall timers live in lib.logger; this module adds the device-level pieces —
a jax.profiler trace context for TensorBoard-compatible device traces, and
MXU-utilization reporting against the analytic FLOP model.
"""

from __future__ import annotations

import contextlib
import time

# nominal single-chip peaks (dense matmul), for utilization percentages
PEAK_TFLOPS = {
    "v5e-fp32": 65.0,     # ~1/3 of bf16 via 3-pass f32 MXU
    "v5e-bf16": 197.0,
    "cpu": 0.05,
}


@contextlib.contextmanager
def trace(logdir="/tmp/jax-trace"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def report_utilization(flops, label="kernel", peak="v5e-fp32", log=None):
    """Time the enclosed block and report achieved TFLOP/s + MXU fraction.

    flops: analytic count (e.g. cc.rccsd.flops_per_update)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    tflops = flops / dt / 1e12
    frac = tflops / PEAK_TFLOPS.get(peak, float("inf"))
    msg = (f"{label}: {dt:.3f} s, {tflops:.2f} TFLOP/s "
           f"({100 * frac:.1f}% of {peak} peak)")
    if log is not None:
        log.info(msg)
    else:
        print(msg, flush=True)
