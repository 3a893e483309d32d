"""Pin the AD Lambda-UCCSD(T) response densities (cc/uccsd_t_rdm.py)
against the reference's hand-derived uccsd_t_lambda.py + uccsd_t_rdm.py
on identical integrals and identical amplitudes.

Run:  PYTHONPATH=.scratch/oracle python tools/pin_uccsd_t_rdm.py
Emits 'PIN <key> <json>' lines (max|d rdm1|, max|d rdm2|, E(T) parity);
values transcribed into tests/test_uccsd_t_rdm.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tools.oracle as oracle  # noqa: E402

OH = "O 0 0 0; H 0 0 0.97"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from pyscf.cc import uccsd_t_lambda, uccsd_t_rdm, uccsd_t as ref_uccsd_t

    t0 = time.time()
    mf = oracle.reference_mf(OH, "6-31g", kind="UHF", conv_tol=1e-12,
                              spin=1)
    from pyscf import cc as ref_cc
    mycc = ref_cc.UCCSD(mf)
    mycc.conv_tol = 1e-11
    mycc.conv_tol_normt = 1e-9
    mycc.max_cycle = 200
    eris = mycc.ao2mo()
    mycc.kernel(eris=eris)
    assert mycc.converged
    t1r, t2r = mycc.t1, mycc.t2
    et_ref = ref_uccsd_t.kernel(mycc, eris, t1r, t2r)
    conv, l1r, l2r = uccsd_t_lambda.kernel(mycc, eris, t1r, t2r)
    dm1_ref = uccsd_t_rdm.make_rdm1(mycc, t1r, t2r, l1r, l2r, eris)
    dm2_ref = uccsd_t_rdm.make_rdm2(mycc, t1r, t2r, l1r, l2r, eris)
    print(f"[{time.time()-t0:.1f}s] reference Lambda(T)+RDMs done "
          f"(E(T)={et_ref:.12f})", flush=True)

    # ours, on the SAME orbitals and the SAME converged amplitudes
    from pyscf_mpcc_tpu.ao2mo import incore as ao2mo_inc
    from pyscf_mpcc_tpu.cc import uccsd, uccsd_t_rdm as ours
    _, _, h_ao, eri_ao = oracle.our_integrals(OH, "6-31g", spin=1)
    na, nb = mf.mol.nelec
    moa, mob = (np.asarray(mf.mo_coeff[0]), np.asarray(mf.mo_coeff[1]))
    dm = mf.make_rdm1()
    j, k = mf.get_jk(mf.mol, dm)
    fa = h_ao + j[0] + j[1] - k[0]
    fb = h_ao + j[0] + j[1] - k[1]
    er = uccsd.make_eris_incore(eri_ao, moa, mob, fa, fb, na, nb)
    t1 = tuple(jnp.asarray(x) for x in t1r)
    t2 = tuple(jnp.asarray(x) for x in t2r)
    et_ours = float(ours.e_t_dense_u(t1, t2, er))
    cl, l1, l2 = ours.lambda_kernel_u(t1, t2, er, conv_tol=1e-9,
                                      max_cycle=200)
    assert cl
    h_a = jnp.asarray(moa.T @ h_ao @ moa)
    h_b = jnp.asarray(mob.T @ h_ao @ mob)
    eri = jnp.asarray(eri_ao)
    g_aa = ao2mo_inc.full(eri, jnp.asarray(moa))
    g_bb = ao2mo_inc.full(eri, jnp.asarray(mob))
    g_ab = ao2mo_inc.general(eri, (moa, moa, mob, mob))
    (d1a, d1b), (d2aa, d2ab, d2bb) = ours.make_rdm12(
        h_a, h_b, g_aa, g_ab, g_bb, t1, t2, l1, l2, na, nb)

    # dm2 comparison in the canonical gauge: dL/dg is only defined up to
    # the integral-symmetry group of its parametrization (chemists'
    # 8-fold for same-spin, p<->q / R<->S for ab), so both tensors are
    # projected onto it before the elementwise diff.  The projections
    # leave every integral contraction invariant.
    def sym8(x):
        x = np.asarray(x)
        x = 0.5 * (x + x.transpose(1, 0, 2, 3))
        x = 0.5 * (x + x.transpose(0, 1, 3, 2))
        return 0.5 * (x + x.transpose(2, 3, 0, 1))

    def symab(x):
        x = np.asarray(x)
        x = 0.5 * (x + x.transpose(1, 0, 2, 3))
        return 0.5 * (x + x.transpose(0, 1, 3, 2))

    dd1a = float(np.abs(np.asarray(d1a) - dm1_ref[0]).max())
    dd1b = float(np.abs(np.asarray(d1b) - dm1_ref[1]).max())
    dd2aa = float(np.abs(sym8(d2aa) - sym8(dm2_ref[0])).max())
    dd2ab = float(np.abs(symab(d2ab) - symab(dm2_ref[1])).max())
    dd2bb = float(np.abs(sym8(d2bb) - sym8(dm2_ref[2])).max())
    dl1 = float(max(np.abs(np.asarray(a) - b).max()
                    for a, b in zip(l1, l1r)))
    print("PIN uccsd_t_rdm_oh " + json.dumps(dict(
        et_ref=float(et_ref), et_ours=et_ours,
        d_et=abs(et_ours - float(et_ref)),
        max_d_l1=dl1,
        max_d_rdm1=max(dd1a, dd1b),
        max_d_rdm2=max(dd2aa, dd2ab, dd2bb),
        wall_s=round(time.time() - t0, 1))), flush=True)


if __name__ == "__main__":
    main()
