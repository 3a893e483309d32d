"""HBM budget governor: size device loops from available memory.

TPU-native counterpart of the reference's max_memory-driven loop sizing
(pyscf/lib/misc.py:113 current_memory + the per-module
``blksize = max_memory // ...`` patterns, e.g. cc/ccsd.py _add_ovvv_):
instead of hand-tuned ``ntile``/``tile`` constants, callers ask the
governor for the largest tile that fits the documented working set of a
kernel within the device's free HBM.

All planners are pure shape arithmetic — safe to call before any array
exists — and every returned knob keeps the static-shape contract (tile
counts divide padded extents exactly).
"""

from __future__ import annotations

import jax

from pyscf_mpcc_tpu import config

_MB = 1024 * 1024


def hbm_budget_bytes(device=None, headroom=0.85):
    """Usable accelerator memory in bytes.

    Honors config.MAX_MEMORY (MB) when set; otherwise queries the device
    allocator (memory_stats), falling back to 12 GiB usable (one v5e chip
    has 16 GiB HBM; XLA reserves some for program + scratch).
    """
    if config.MAX_MEMORY:
        return int(config.MAX_MEMORY) * _MB
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit:
            return int((limit - in_use) * headroom)
    except Exception:
        pass
    return int(12 * 1024 * _MB)


def _itemsize(dtype):
    import numpy as np
    return np.dtype(dtype).itemsize


def plan_ladder_ntile(nocc, nvir, naux, dtype="float32", budget=None,
                      vjp=False):
    """Tile count per virtual axis for the pair-tiled DF vvvv ladder
    (cc/rccsd._ladder_df).

    Working set per tile PAIR beyond the persistent tensors: the dressed
    4-index W block w[a_tile, c, b_tile, d] = (tsz, nvir, tsz, nvir)
    that pair_fn materializes before contracting with tau
    (cc/rccsd._ladder_df "Lac,Lbd->acbd"), i.e. bytes_per_pair ~
    (nvir/ntile)^2 * nvir^2 * isz * 2 (block + its double buffer), plus
    the stacked per-pair outputs (~0.56 * t2 size).  An earlier revision
    modeled only three virtual dims and chose ntile=1..8 at
    (H2O)8/cc-pVTZ scale — a 19.5 GB allocation the device compiler
    rejects.
    Returns the smallest ntile whose per-pair block (with its lax.map
    double buffer, the factor 2 below) fits in half of what remains
    after the persistent tensors; nvir need not be divisible (the
    ladder zero-pads).  Fewer/larger tiles are measurably faster (v5e,
    (H2O)8/cc-pVTZ shape: ntile=8 0.99 s vs ntile=10 1.30 s vs the old
    single-axis ntile=106 1.12 s), so the planner is as aggressive as
    the budget allows.  Small tail tiles are MXU-hostile (the tau
    contraction's M dim is tsz^2), so tsz is kept >= 16 where possible.

    vjp=True plans for the Lambda/RDM backward sweep, where the
    rematerialized W block AND its cotangent are live simultaneously
    (2x the forward block set) and more t2-sized cotangents persist.
    """
    isz = _itemsize(dtype)
    budget = budget if budget is not None else hbm_budget_bytes()
    n_t2like = 7 if vjp else 4
    persistent = (naux * nvir * nvir + naux * nocc * nvir
                  + n_t2like * nocc * nocc * nvir * nvir) * isz
    avail = max(budget - persistent, budget // 8)
    live = 4 if vjp else 2
    for ntile in range(1, nvir + 1):
        tsz = -(-nvir // ntile)
        per_pair = tsz * tsz * nvir * nvir * isz * live
        if per_pair <= avail // 2:
            return ntile
        if tsz <= 16:
            break
    return -(-nvir // 16)


def ccsd_working_set_bytes(nocc, nvir, naux, ntile=1, dtype="float32",
                           ndev=1, stream_vv=False):
    """Model of the DF-CCSD update working set (bytes) on one device.

    ndev=1: the single-device footprint — persistent DF factors + the
    four-index ERI blocks + amplitudes (t, t_new, DIIS extrapolant) + the
    ladder tile block.  ndev>1: the per-device footprint under the
    parallel.mesh layout (Lvv/Lov/Loo sharded over naux, t2-likes sharded
    over the first occupied axis, small four-index blocks replicated).
    Used by the capacity tests to prove a problem exceeds one device's
    budget while its sharded layout fits (reference envelope analog:
    FEATURES:74 out-of-core sizing).

    stream_vv=True models the single-chip out-of-core mode
    (cc/stream_ladder): Lvv leaves the device entirely; what remains of
    it on-device is two streamed row tiles (the fetched tile + its
    double buffer)."""
    isz = _itemsize(dtype)
    o2v2 = nocc * nocc * nvir * nvir
    tsz = -(-nvir // max(ntile, 1))
    lvv = naux * nvir * nvir * isz
    if stream_vv:
        lvv = 2 * naux * tsz * nvir * isz      # fetched tile + buffer
    df = lvv + (naux * nocc * nvir
                + naux * nocc * nocc) * isz    # (Lvv) + Lov + Loo
    eris4 = 4 * o2v2 * isz                     # ovov + oovv + ovvo + ovoo~
    t2likes = 3 * o2v2 * isz                   # t2, t2new, tau
    tile = tsz * tsz * nvir * nvir * isz * 2
    if ndev == 1:
        return df + eris4 + t2likes + tile
    return df // ndev + eris4 + t2likes // ndev + tile


def plan_triples_tile(nocc, nvir, naux, dtype="float32", budget=None,
                      max_tile=8):
    """Tile edge for the fused CCSD(T) engine (cc/ccsd_t.kernel).

    Per-tile live set: six W dot outputs of (T^3 * nocc^3) elements each,
    double-buffered across the XLA-write/Pallas-read boundary plus dot
    workspace (factor 4 total, calibrated on v5e: tile=8 fits at
    (H2O)8/cc-pVTZ, tile=12 exhausts HBM), the six ov blocks, and the
    persistent t2T/t2Ts/oovv_T/L tensors.  Picks the largest even
    T <= max_tile that fits; minimum 4."""
    isz = _itemsize(dtype)
    budget = budget if budget is not None else hbm_budget_bytes()
    persistent = (3 * nvir * nvir * nocc * nocc      # t2T + t2Ts + oovv_T
                  + naux * nvir * nvir + naux * nocc * nvir) * isz
    avail = max(budget - persistent, budget // 8)
    best = 4
    for T in range(4, max_tile + 1, 2):
        live = (6 * T**3 * nocc**3 + 6 * T * T * nocc * nvir) * isz * 4
        if live <= avail:
            best = T
    return best
