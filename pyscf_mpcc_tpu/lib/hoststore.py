"""Host-RAM tensor store for single-chip out-of-core streaming.

TPU-native counterpart of the reference's HDF5 out-of-core tensors
(pyscf/cc/ccsd.py:1611 _make_eris_outcore + lib.call_in_background
double buffering): a tensor too large for HBM stays in host memory
(numpy) and jitted code pulls TILES of it on demand through
``jax.experimental.io_callback``.  The handle is a plain int32 scalar,
so it rides inside jit/scan as an ordinary traced value and containers
like cc.eris.RERIs stay pure pytrees.

Used by cc.stream_ladder for the DF particle-particle ladder whose
Lvv factor exceeds HBM (the reference envelope "CCSD ~100 occ/1500 vir"
needs naux*nvir^2 ~ 50 GB of Lvv in fp32 — 3x one v5e chip's HBM).
"""

from __future__ import annotations

import numpy as np

_STORE: dict[int, np.ndarray] = {}
_NEXT = [1]


def put(arr) -> int:
    """Register a host tensor; returns the int handle."""
    h = _NEXT[0]
    _NEXT[0] += 1
    _STORE[h] = np.ascontiguousarray(arr)
    return h


def get(handle: int) -> np.ndarray:
    return _STORE[int(handle)]


def drop(handle: int) -> None:
    _STORE.pop(int(handle), None)


def nbytes() -> int:
    return sum(a.nbytes for a in _STORE.values())


def fetch_rows(handle, start, tsz):
    """Host callback body: rows [start, start+tsz) of axis 1 of a 3D
    tensor (naux, nr, nc) -> (naux, tsz, nc).  Out-of-range rows are
    zero-padded (tile plans may overhang the true extent)."""
    arr = _STORE[int(handle)]
    s = int(start)
    blk = arr[:, s:s + int(tsz), :]
    if blk.shape[1] < int(tsz):
        pad = np.zeros((arr.shape[0], int(tsz) - blk.shape[1],
                        arr.shape[2]), arr.dtype)
        blk = np.concatenate([blk, pad], axis=1)
    return blk


def fetch_cols(handle, start, tsz):
    """Host callback body: columns [start, start+tsz) of axis 2 ->
    (naux, nr, tsz), zero-padded past the edge."""
    arr = _STORE[int(handle)]
    s = int(start)
    blk = arr[:, :, s:s + int(tsz)]
    if blk.shape[2] < int(tsz):
        pad = np.zeros((arr.shape[0], arr.shape[1],
                        int(tsz) - blk.shape[2]), arr.dtype)
        blk = np.concatenate([blk, pad], axis=2)
    return np.ascontiguousarray(blk)
