"""AO -> MO integral transformation (O(N^5) quarter transforms).

Role of the reference's ao2mo/incore.py + C drivers, recast as dense
matricized dot_generals that XLA maps onto the MXU: each quarter transform
is a single (nao, nao^3) x (nao, nmo) matmul.  Works under jit on TPU and
on the CPU backend in fp64 for parity tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def general(eri_ao, mo_coeffs):
    """(pq|rs) -> (ij|kl) with four independent MO coefficient sets.

    eri_ao: (nao,nao,nao,nao) chemists' AO integrals.
    mo_coeffs: tuple of four (nao, n_i) matrices for the i, j, k, l slots.
    """
    ci, cj, ck, cl = mo_coeffs
    out = jnp.tensordot(ci, eri_ao, axes=(0, 0))        # (i, q, r, s)
    out = jnp.tensordot(cj, out, axes=(0, 1))           # (j, i, r, s)
    out = out.transpose(1, 0, 2, 3)
    out = jnp.tensordot(out, ck, axes=(2, 0))           # (i, j, s, k)
    out = jnp.tensordot(out, cl, axes=(2, 0))           # (i, j, k, l)
    return out


def full(eri_ao, mo_coeff):
    return general(eri_ao, (mo_coeff,) * 4)
