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


def init(n, space=6, dtype=jnp.float32, err_dtype=None):
    """err_dtype=jnp.bfloat16 halves the error-ring HBM footprint.

    Error vectors only enter through the Gram matrix B (the hostsolve
    hybrid solves it in fp64 regardless), so bf16 storage costs ~3
    digits of B-entry precision — fine while |err| spans the DIIS-useful
    range, and the extrapolated x itself stays full precision (xs is
    never downcast).  The win: at (H2O)8 Lambda scale the space-6 ring
    drops from 8.8 GB to 6.6 GB, which is what lets it co-fit with the
    pair-ladder vjp (docs/PARITY.md round-4)."""
    return DIISState(
        xs=jnp.zeros((space, n), dtype),
        errs=jnp.zeros((space, n), err_dtype or dtype),
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
    errs = jax.lax.dynamic_update_slice(
        state.errs, err.astype(state.errs.dtype)[None, :], (slot, zi))
    count = state.count + 1
    nd = jnp.minimum(count, space)

    valid = (jnp.arange(space) < nd).astype(xs.dtype)
    # B matrix over the valid history (invalid rows forced to identity-ish)
    ev = errs * valid[:, None].astype(errs.dtype)
    B = jax.lax.dot_general(ev, ev, (((1,), (1,)), ((), ())),
                            preferred_element_type=xs.dtype)
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
    # filter at the working dtype's resolution: eigenvalues below
    # ~50 eps * wmax are rounding noise of the Gram entries, and
    # inverting them is what stalls fp32 DIIS (the reference's 1e-14 is
    # an fp64 constant, meaningless here)
    keep = jnp.abs(w) > 50 * jnp.finfo(xs.dtype).eps * wmax
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    c = v @ (winv * (v.T @ g))
    coef = c[1:] * valid
    x_new = coef @ xs
    return DIISState(xs, errs, count), x_new


@partial(jax.jit, donate_argnums=(0,))
def push(state: DIISState, x, err):
    """Store (x, err) in the donated ring; return (state, G) with G the
    (space, space) Gram matrix of the valid error history (invalid rows
    zero).  First half of the host-solve hybrid: amplitude-sized data
    stays in HBM, only G — a few hundred bytes — leaves the device."""
    space, n = state.xs.shape
    slot = (state.count % space).astype(jnp.int32)
    zi = jnp.int32(0)
    xs = jax.lax.dynamic_update_slice(state.xs, x[None, :], (slot, zi))
    errs = jax.lax.dynamic_update_slice(
        state.errs, err.astype(state.errs.dtype)[None, :], (slot, zi))
    count = state.count + 1
    valid = (jnp.arange(space) < jnp.minimum(count, space)).astype(xs.dtype)
    ev = errs * valid[:, None].astype(errs.dtype)
    g = jax.lax.dot_general(ev, ev, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return DIISState(xs, errs, count), g


@jax.jit
def extrapolate(state: DIISState, coef):
    """Extrapolated vector from host-solved coefficients (second half of
    the hybrid).  Not donated: the ring must survive for the next cycle."""
    return coef @ state.xs


def update_hostsolve(state: DIISState, x, err):
    """Hybrid Pulay update: ring buffer + Gram dots on device, the tiny
    (nd+1)^2 augmented B system solved on the HOST in fp64.

    The fully-on-device :func:`update` does its eigendecomposition in the
    ring's dtype; in fp32 the B matrix spans ~(err ratio)^2 orders of
    magnitude and the filtered solve runs out of precision around
    |dt| ~ 1e-5 (measured: benzene/cc-pVTZ stalls unconverged where the
    host ring reaches 1e-6).  Solving the SMALL system in fp64 on the
    host costs ~200 bytes/cycle over the link — amplitude-sized buffers
    never move, which is the point of the device ring — and restores the
    host ring's convergence envelope.  Reference counterpart: the fp64
    extrapolate of pyscf/lib/diis.py:245."""
    import numpy as np
    from .diis import solve_diis_b

    state, G = push(state, x, err)
    space = state.xs.shape[0]
    nd = int(min(int(state.count), space))
    Gh = np.asarray(G, dtype=np.float64)[:nd, :nd]
    coef = np.zeros(space)
    coef[:nd] = solve_diis_b(Gh)
    return state, extrapolate(state, jnp.asarray(coef, state.xs.dtype))
