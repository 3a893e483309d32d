"""AOT memory analysis of the open-shell Lambda step at campaign shape.

Compiles cc/lambda_ad._lambda_step_u at the OH(H2O)3/cc-pVTZ shape
(na=20, nb=19, nva=198, nvb=199, naux=526, fp32) WITHOUT uploading any
data and prints XLA's memory_analysis() — the temp budget that must
co-fit with the resident DF eris + amplitudes + DIIS ring on one 16 GB
v5e.  The stage32 campaign OOMed in the first ulambda cycle
(.campaign/oh3w_parity_cc-pvtz_cc-pvtz-jkfit/stage32_r4.log); this
replaces run-and-OOM iteration with one compile sweep per candidate fix.

Usage:  python tools/ulambda_mem_probe.py [ntile ...]
"""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pyscf_mpcc_tpu.cc import lambda_ad
from pyscf_mpcc_tpu.cc.uccsd import UERIs

NA, NB, NVA, NVB, NAUX = 20, 19, 198, 199, 526
NMA, NMB = NA + NVA, NB + NVB


def abstract_eris():
    f32 = jnp.float32
    S = jax.ShapeDtypeStruct

    def blk(*dims):
        sz = dict(o=NA, O=NB, v=NVA, V=NVB)
        return S(tuple(sz[d] for d in dims), f32)

    return UERIs(
        focka=S((NMA, NMA), f32), fockb=S((NMB, NMB), f32),
        nocca=NA, noccb=NB,
        oooo=blk("o", "o", "o", "o"), ovoo=blk("o", "v", "o", "o"),
        ovov=blk("o", "v", "o", "v"), oovv=blk("o", "o", "v", "v"),
        ovvo=blk("o", "v", "v", "o"),
        OOOO=blk("O", "O", "O", "O"), OVOO=blk("O", "V", "O", "O"),
        OVOV=blk("O", "V", "O", "V"), OOVV=blk("O", "O", "V", "V"),
        OVVO=blk("O", "V", "V", "O"),
        ooOO=blk("o", "o", "O", "O"), ovOO=blk("o", "v", "O", "O"),
        OVoo=blk("O", "V", "o", "o"), ovOV=blk("o", "v", "O", "V"),
        ooVV=blk("o", "o", "V", "V"), OOvv=blk("O", "O", "v", "v"),
        ovVO=blk("o", "v", "V", "O"), OVvo=blk("O", "V", "v", "o"),
        Lov_a=S((NAUX, NA, NVA), f32), Lvv_a=S((NAUX, NVA, NVA), f32),
        Lov_b=S((NAUX, NB, NVB), f32), Lvv_b=S((NAUX, NVB, NVB), f32),
    )


def probe():
    S = jax.ShapeDtypeStruct
    f32 = jnp.float32
    l1 = (S((NA, NVA), f32), S((NB, NVB), f32))
    l2 = (S((NA, NA, NVA, NVA), f32), S((NA, NB, NVA, NVB), f32),
          S((NB, NB, NVB, NVB), f32))
    er = abstract_eris()
    t0 = time.time()
    try:
        lowered = lambda_ad._lambda_step_u.lower(l1, l2, l1, l2, er)
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        gib = 2.0 ** 30
        print(f"ulambda step  temp={m.temp_size_in_bytes / gib:7.2f} GiB  "
              f"args={m.argument_size_in_bytes / gib:6.2f}  "
              f"out={m.output_size_in_bytes / gib:5.2f}  "
              f"[{time.time() - t0:.0f}s]", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"ulambda step  FAILED {msg}  [{time.time() - t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    print(f"device={jax.devices()[0]}", flush=True)
    probe()
