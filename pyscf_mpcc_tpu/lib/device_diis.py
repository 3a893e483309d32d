"""On-device Pulay DIIS: ring buffer + B-matrix solve as jitted JAX.

The reference keeps DIIS history on the host (HDF5-spillable ring buffer,
lib/diis.py).  Here the history lives in HBM as a stacked device array and
the whole update — error dot products, filtered solve of the augmented
B system, extrapolation — is one jitted call, so the CC iteration never
moves amplitude-sized data to the host (BASELINE north star: "DIIS
extrapolation runs on-device").

Functional API: a state pytree + a pure update, usable inside
lax.while_loop drivers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DIISState(NamedTuple):
    xs: jnp.ndarray     # (space, n)
    errs: jnp.ndarray   # (space, n)
    count: jnp.ndarray  # () int32 — total vectors stored so far


def init(n, space=6, dtype=jnp.float32):
    return DIISState(
        xs=jnp.zeros((space, n), dtype),
        errs=jnp.zeros((space, n), dtype),
        count=jnp.zeros((), jnp.int32),
    )


@partial(jax.jit, donate_argnums=(0,))
def update(state: DIISState, x, err):
    """Store (x, err), return (new_state, extrapolated_x).

    The state is DONATED: the ring buffers are updated in place, so the
    transient footprint is one history slot, not a second full ring
    (2 x space x |x| — the difference between fitting and OOMing beside
    the CCSD update working set at (H2O)8 scale).  Callers must rebind
    the state from the return value (all do)."""
    space, n = state.xs.shape
    slot = (state.count % space).astype(jnp.int32)
    zi = jnp.int32(0)
    xs = jax.lax.dynamic_update_slice(state.xs, x[None, :], (slot, zi))
    errs = jax.lax.dynamic_update_slice(state.errs, err[None, :], (slot, zi))
    count = state.count + 1
    nd = jnp.minimum(count, space)

    valid = (jnp.arange(space) < nd).astype(xs.dtype)
    # B matrix over the valid history (invalid rows forced to identity-ish)
    B = (errs * valid[:, None]) @ (errs * valid[:, None]).T
    # augmented system [[0, -1], [-1, B]] [lam, c] = [-1, 0] via filtered eig
    h = jnp.zeros((space + 1, space + 1), xs.dtype)
    h = h.at[0, 1:].set(valid)
    h = h.at[1:, 0].set(valid)
    h = h.at[1:, 1:].set(B)
    # keep invalid slots decoupled with unit diagonal
    inv = 1.0 - valid
    h = h + jnp.diag(jnp.concatenate([jnp.zeros((1,), xs.dtype), inv]))
    g = jnp.zeros((space + 1,), xs.dtype).at[0].set(1.0)
    w, v = jnp.linalg.eigh(h)
    wmax = jnp.max(jnp.abs(w))
    keep = jnp.abs(w) > 1e-12 * wmax
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    c = v @ (winv * (v.T @ g))
    coef = c[1:] * valid
    x_new = coef @ xs
    return DIISState(xs, errs, count), x_new
