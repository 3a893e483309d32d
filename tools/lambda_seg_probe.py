"""Per-segment AOT memory probe for the (H2O)8 Lambda step.

Compiles a one-segment variant of the segmented jtvp for each residual
segment (same seeding/barrier structure as lambda_ad._lambda_step) and
prints its temp arena — identifies which segment's backward sets the
peak at each ladder ntile.  Compile-only, no data.

Usage: python tools/lambda_seg_probe.py [ntile ...]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pyscf_mpcc_tpu.cc import rccsd
from pyscf_mpcc_tpu.cc.eris import RERIs

NOCC, NVIR, NAUX = 32, 424, 1112
NMO = NOCC + NVIR


def abstract_eris():
    f32 = jnp.float32
    S = jax.ShapeDtypeStruct
    return RERIs(
        fock=S((NMO, NMO), f32), mo_energy=S((NMO,), f32),
        oooo=S((NOCC,) * 4, f32),
        ovoo=S((NOCC, NVIR, NOCC, NOCC), f32),
        ovov=S((NOCC, NVIR, NOCC, NVIR), f32),
        oovv=S((NOCC, NOCC, NVIR, NVIR), f32),
        ovvo=None, ovvv=None, vvvv=None,
        Lvv=S((NAUX, NVIR, NVIR), f32),
        Lov=S((NAUX, NOCC, NVIR), f32),
        Loo=S((NAUX, NOCC, NOCC), f32),
    )


@partial(jax.jit, static_argnames=("ntile", "iseg"), donate_argnums=(0, 1))
def one_seg(l1, l2, t1, t2, eris, ntile=1, iseg=0):
    nocc = t1.shape[0]
    eo = eris.mo_energy[:nocc]
    ev = eris.mo_energy[nocc:]
    eia = eo[:, None] - ev[None, :]
    d2 = eia[:, None, :, None] + eia[None, :, None, :]
    j1 = -l1 * eia
    j2 = -l2 * d2
    fn, kind = rccsd.residual_segments(eris, ntile=ntile)[iseg]
    _, vjp = jax.vjp(fn, t1, t2)
    if kind == "r1":
        ct = l1
    elif kind == "k":
        ct = l2 + l2.transpose(1, 0, 3, 2)
    else:
        ct = l2
    a, b = vjp(ct)
    return j1 + a, j2 + b


if __name__ == "__main__":
    ntiles = [int(a) for a in sys.argv[1:]] or [8, 16]
    S = jax.ShapeDtypeStruct
    f32 = jnp.float32
    l1 = S((NOCC, NVIR), f32)
    l2 = S((NOCC, NOCC, NVIR, NVIR), f32)
    er = abstract_eris()
    names = ["seg_t1_fvv", "seg_t1_foo", "seg_t1_fov", "seg_t1_rest",
             "seg_k_light", "seg_ring_voov", "seg_ring_vovo",
             "seg_oooo", "seg_ladder"]
    print(f"device={jax.devices()[0]}", flush=True)
    gib = 2.0 ** 30
    for nt in ntiles:
        for i, name in enumerate(names):
            t0 = time.time()
            try:
                c = one_seg.lower(l1, l2, l1, l2, er, ntile=nt,
                                  iseg=i).compile()
                m = c.memory_analysis()
                print(f"ntile={nt:3d} seg{i} {name:15s} "
                      f"temp={m.temp_size_in_bytes / gib:7.2f} GiB "
                      f"[{time.time() - t0:.0f}s]", flush=True)
            except Exception as e:
                print(f"ntile={nt:3d} seg{i} {name:15s} FAILED "
                      f"{str(e).splitlines()[0][:150]}", flush=True)
