"""HDF5 checkpoint save/load of nested dict/array payloads.

Role of the reference's lib/chkfile.py (:28 load, :76 save) + the CCSD
dump_chk payload (cc/ccsd.py:1318: e_corr, t1, t2, ...): crash-restart and
scanner-style warm starts.  Arrays stored as datasets, nested dicts as
groups, scalars as attributes-free 0-d datasets.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
    HAS_H5PY = True
except Exception:  # pragma: no cover
    HAS_H5PY = False


def save(path, key, value):
    """Save a (possibly nested-dict) value under ``key``."""
    if not HAS_H5PY:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "a") as f:
        if key in f:
            del f[key]
        _write(f, key, value)


def _write(grp, key, value):
    if isinstance(value, dict):
        sub = grp.create_group(key)
        for k, v in value.items():
            _write(sub, k, v)
    elif isinstance(value, (list, tuple)):
        sub = grp.create_group(key)
        sub.attrs["__seq__"] = True
        for i, v in enumerate(value):
            _write(sub, f"{i:08d}", v)
    else:
        grp[key] = np.asarray(value)


def load(path, key):
    if not HAS_H5PY:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        return _read(f[key])


def _read(node):
    import h5py as _h
    if isinstance(node, _h.Group):
        if node.attrs.get("__seq__", False):
            return [_read(node[k]) for k in sorted(node.keys())]
        return {k: _read(node[k]) for k in node.keys()}
    val = node[()]
    return val


def dump_cc(path, e_corr, t1, t2, mo_coeff=None, key="ccsd"):
    """CCSD checkpoint payload (reference cc/ccsd.py:1318)."""
    payload = {"e_corr": np.asarray(e_corr),
               "t1": np.asarray(t1), "t2": np.asarray(t2)}
    if mo_coeff is not None:
        payload["mo_coeff"] = np.asarray(mo_coeff)
    save(path, key, payload)


def load_cc(path, key="ccsd"):
    return load(path, key)
