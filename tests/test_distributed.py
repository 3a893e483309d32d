"""Two-process jax.distributed smoke test (the DCN path).

Spawns two OS processes, each with 2 virtual CPU devices, joined through
parallel.distributed.initialize into one 4-device job; both a raw
cross-process psum and the production sharded ladder must run and agree
with the local reference.  This is the CI stand-in for a multi-host TPU
pod (reference counterpart: the MPI hook of lib/cc/ccsd_t.c:856 that
mpi4pyscf drives)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_and_sharded_ladder():
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    port = str(_free_port())
    from conftest import clean_child_env
    env = clean_child_env(
        XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen([sys.executable, worker, str(r), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-2000:]}"
        assert f"DISTOK {r} 4" in out, out[-2000:]
