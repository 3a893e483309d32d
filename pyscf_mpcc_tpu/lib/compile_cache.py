"""Persistent XLA compilation cache.

TPU-native production feature with no reference counterpart (the
reference's C kernels are ahead-of-time compiled, so it never pays a
per-process compile): under ``jit`` every (program, shape) pair costs a
20-40 s XLA compile on first use, which dominates wall time for
small-molecule jobs (benzene/6-31G** CCSD is ~2 s of MXU work behind
~80 s of compiles) and for repeated production drivers (PES scanners,
per-fragment MPCC solves, preemption restarts).  Serializing compiled
executables to disk makes every repeat process start warm — the TPU
analog of the reference shipping prebuilt ``libcc.so``.

Enabled by default via :data:`config.COMPILATION_CACHE_DIR`; set the
``PYSCF_MPCC_TPU_COMPILATION_CACHE_DIR`` env var to relocate it or to
"" to disable.  Safe to call any time before the first compile; calling
after some compiles simply caches later ones.

Portability caveat: JAX keys cache entries by program/topology, not by
host CPU features, so XLA:CPU executables cached under a $HOME shared
across heterogeneous nodes can be loaded on a machine whose CPU lacks
the instruction set they were compiled for (JAX logs a SIGILL warning).
To mitigate, the default directory is scoped per backend+machine
architecture (see :func:`_default_scoped_dir`); point the env var at a
host-local path if your cluster shares $HOME across different CPU
generations of the same architecture.
"""

from __future__ import annotations

import os
import platform

_enabled_dir = None


def _default_scoped_dir(base: str) -> str:
    """Scope the default cache dir per configured platform + machine
    architecture so a $HOME shared across heterogeneous nodes never
    mixes executables compiled for different hosts (JAX does not key
    entries on host CPU features; a mismatch can SIGILL).

    Must not initialize the XLA backend (we are called at subpackage
    import time, possibly before jax.distributed.initialize), so this
    reads the *configured* platform string rather than
    jax.default_backend()."""
    try:
        import jax
        backend = jax.config.jax_platforms or "auto"
    except Exception:
        backend = "unknown"
    backend = backend.replace(",", "+")
    # machine() alone is not enough: two x86_64 hosts with different
    # ISA extensions (avx512/amx subsets) still SIGILL-cross-load each
    # other's AOT executables (observed on this project's VM after a
    # migration) — fold a hash of the CPU feature flags in
    # ... and the cpuinfo flag set is still not sufficient: round 5 hit
    # same-flags hosts whose XLA:CPU builds disagreed on tuning features
    # (+prefer-no-scatter/-gather), and the cross-loaded executables
    # segfaulted inside cache writes.  Fold the kernel release + jaxlib
    # version in as a migration fingerprint.
    import hashlib
    key = ""
    try:
        import jaxlib
        key += platform.uname().release + ";" \
            + getattr(jaxlib, "__version__", "0")
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    key += ";" + " ".join(
                        sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    feat = "-" + hashlib.sha1(key.encode()).hexdigest()[:8] if key else ""
    return os.path.join(base, "%s-%s%s" % (backend, platform.machine(),
                                           feat))


def enable_compilation_cache(dirpath: str | None = None,
                             min_compile_secs: float = 0.5) -> str | None:
    """Point JAX's persistent compilation cache at ``dirpath``.

    Returns the cache directory in use, or None if disabled (empty
    path) or the flags are unavailable.  Idempotent.
    """
    global _enabled_dir
    from pyscf_mpcc_tpu import config

    explicit = dirpath is not None or bool(
        os.environ.get("PYSCF_MPCC_TPU_COMPILATION_CACHE_DIR"))
    d = dirpath if dirpath is not None else config.getattr_cfg(
        "COMPILATION_CACHE_DIR", "")
    if not d:
        return None
    d = os.path.abspath(os.path.expanduser(d))
    if not explicit:
        d = _default_scoped_dir(d)
    if _enabled_dir == d:
        return d
    try:
        import jax
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every executable worth a disk read: CC programs are huge
        # but even mid-sized SCF/MP2 kernels repay caching
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    _enabled_dir = d
    return d
