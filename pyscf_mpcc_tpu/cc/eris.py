"""MO integral containers for the CC stack.

Role of the reference's ``_ChemistsERIs`` (pyscf/cc/ccsd.py:1484) re-designed
functionally: an immutable pytree of dense chemists'-notation MO blocks that
jitted update functions close over.  No tril packing (the MXU wants dense
padded tiles) and no HDF5 out-of-core path: large cases use the DF variant,
whose 3-center factors are the shardable object.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class RERIs(NamedTuple):
    """Dense chemists' MO blocks for restricted CC.  All jnp arrays.

    Naming: block[p,q,r,s] = (pq|rs) with o=occupied, v=virtual slots.
    """
    fock: jnp.ndarray        # (nmo, nmo) MO-basis Fock
    mo_energy: jnp.ndarray   # (nmo,) = diag(fock) for canonical orbitals
    oooo: jnp.ndarray        # (ij|kl)
    ovoo: jnp.ndarray        # (ia|jk)
    ovov: jnp.ndarray        # (ia|jb)
    oovv: jnp.ndarray        # (ij|ab)
    ovvo: Optional[jnp.ndarray]  # (ia|bj); None -> derived from ovov
    ovvv: jnp.ndarray        # (ia|bc)
    vvvv: Optional[jnp.ndarray]  # (ab|cd); None in DF mode
    Lvv: Optional[jnp.ndarray] = None   # (naux, a, b) DF factor, DF mode
    Lov: Optional[jnp.ndarray] = None   # (naux, i, a)
    Loo: Optional[jnp.ndarray] = None   # (naux, i, j)
    # single-chip out-of-core mode (cc/stream_ladder): Lvv stays in host
    # RAM (lib/hoststore) and this () int32 handle replaces it; jitted
    # consumers pull row tiles through io_callback.  Mutually exclusive
    # with Lvv.
    Lvv_stream: Optional[jnp.ndarray] = None

    @property
    def nocc(self):
        return self.oooo.shape[0]

    @property
    def nvir(self):
        return self.fock.shape[0] - self.oooo.shape[0]

    def get_ovvo(self):
        """(ia|bj).  For real orbitals (ia|bj) = (ia|jb), so DF mode
        stores no ovvo block at all — the transpose fuses into whatever
        dot consumes it under jit, saving an nocc^2 nvir^2 HBM tensor
        (736 MB at (H2O)8/cc-pVTZ)."""
        if self.ovvo is not None:
            return self.ovvo
        return jnp.transpose(self.ovov, (0, 1, 3, 2))


def make_eris_incore(eri_ao, mo_coeff, fock_ao, nocc, dtype=None):
    """Full-ERI container (parity/testing path; reference ccsd.py:1554)."""
    from pyscf_mpcc_tpu import ao2mo
    mo = jnp.asarray(mo_coeff, dtype=dtype)
    eri_ao = jnp.asarray(eri_ao, dtype=dtype)
    mo_eri = ao2mo.full(eri_ao, mo)
    o = slice(0, nocc)
    v = slice(nocc, mo.shape[1])
    fock = jnp.asarray(mo_coeff.T @ fock_ao @ mo_coeff,
                       dtype=dtype)
    return RERIs(
        fock=fock,
        mo_energy=jnp.diagonal(fock),
        oooo=mo_eri[o, o, o, o],
        ovoo=mo_eri[o, v, o, o],
        ovov=mo_eri[o, v, o, v],
        oovv=mo_eri[o, o, v, v],
        ovvo=mo_eri[o, v, v, o],
        ovvv=mo_eri[o, v, v, v],
        vvvv=mo_eri[v, v, v, v],
    )


def _transform_b_ozaki(B, mo, s=6):
    """MO-basis DF factor (naux, nmo, nmo) with the two AO->MO dgemms
    on the int8 MXU at fp64 grade (ops/ozaki.matmul64).  The chained
    stage consumes stage 1's finalized host fp64, so no device resplit
    is involved."""
    from pyscf_mpcc_tpu.ops import ozaki
    naux, nao = B.shape[0], B.shape[1]
    nmo = mo.shape[1]
    t1m = ozaki.matmul64(
        np.ascontiguousarray(B.transpose(0, 2, 1)).reshape(naux * nao, nao),
        mo, s=s)
    t1m = np.ascontiguousarray(
        t1m.reshape(naux, nao, nmo).transpose(0, 2, 1)).reshape(
            naux * nmo, nao)
    return ozaki.matmul64(t1m, mo, s=s).reshape(naux, nmo, nmo)


def make_eris_df(b_ao, mo_coeff, fock_ao, nocc, dtype=None, keep_ovvv=True,
                 stream_vv=False, transform_backend=None):
    """DF container: all blocks from B factors; vvvv left implicit.

    Reference analog: dfccsd._make_df_eris (pyscf/cc/dfccsd.py:125) which
    stores vvL and rebuilds (ac|bd) per block pair; here the Lvv factor is a
    device array contracted on the fly inside the jitted update.

    stream_vv=True is the single-chip out-of-core mode (the TPU-native
    counterpart of the reference's HDF5 _make_eris_outcore,
    pyscf/cc/ccsd.py:1611): the (naux, nvir, nvir) Lvv factor — the one
    tensor that outgrows HBM first — never reaches the device.  It is
    registered in lib.hoststore and jitted consumers (cc/stream_ladder)
    pull row tiles on demand; the o^2v^2-class blocks still live in HBM.
    Implies keep_ovvv=False.
    """
    mo = np.asarray(mo_coeff)
    co, cv = mo[:, :nocc], mo[:, nocc:]
    B = np.asarray(b_ao)
    if transform_backend == "ozaki":
        # the two nao^2-scale AO->MO dgemms are ~4.4e14 fp64 flops at
        # (H2O)8/cc-pVTZ — the actual wall of the fp64 certification
        # stage on a one-core host (round-4's 7075 s was mostly THIS,
        # not the Lagrangian).  Run them fp64-grade on the int8 MXU.
        bmo = _transform_b_ozaki(B, mo)
        Loo = jnp.asarray(bmo[:, :nocc, :nocc], dtype=dtype)
        Lov = jnp.asarray(bmo[:, :nocc, nocc:], dtype=dtype)
        Lvv_np = np.ascontiguousarray(bmo[:, nocc:, nocc:])
        if dtype is not None:
            Lvv_np = Lvv_np.astype(dtype)
    else:
        Lo = np.einsum("Lpq,pi->Liq", B, co, optimize=True)
        Loo = jnp.asarray(np.einsum("Liq,qj->Lij", Lo, co, optimize=True),
                          dtype=dtype)
        Lov = jnp.asarray(np.einsum("Liq,qa->Lia", Lo, cv, optimize=True),
                          dtype=dtype)
        Lv = np.einsum("Lpq,pa->Laq", B, cv, optimize=True)
        Lvv_np = np.einsum("Laq,qb->Lab", Lv, cv, optimize=True)
        if dtype is not None:
            Lvv_np = Lvv_np.astype(dtype)
    fock = jnp.asarray(mo.T @ fock_ao @ mo, dtype=dtype)
    if stream_vv:
        from pyscf_mpcc_tpu.lib import hoststore
        oovv = jnp.asarray(
            np.einsum("Lij,Lab->ijab", np.asarray(Loo), Lvv_np,
                      optimize=True), dtype=dtype)
        handle = jnp.asarray(hoststore.put(Lvv_np), jnp.int32)
        Lvv, ovvv = None, None
    else:
        Lvv = jnp.asarray(Lvv_np)
        oovv = jnp.einsum("Lij,Lab->ijab", Loo, Lvv)
        ovvv = jnp.einsum("Lia,Lbc->iabc", Lov, Lvv) if keep_ovvv else None
        handle = None
    return RERIs(
        fock=fock,
        mo_energy=jnp.diagonal(fock),
        oooo=jnp.einsum("Lij,Lkl->ijkl", Loo, Loo),
        ovoo=jnp.einsum("Lia,Ljk->iajk", Lov, Loo),
        ovov=jnp.einsum("Lia,Ljb->iajb", Lov, Lov),
        oovv=oovv,
        ovvo=None,               # == ovov.transpose(0,1,3,2); derived lazily
        ovvv=ovvv,
        vvvv=None,
        Lvv=Lvv, Lov=Lov, Loo=Loo, Lvv_stream=handle,
    )
