"""Pin the AD Lambda-GCCSD(T) response densities (cc/gccsd_t_rdm.py)
against the reference's gccsd_t_lambda.py + gccsd_t_rdm.py on identical
integrals and identical amplitudes (GHF embedding of the OH doublet).

Run:  PYTHONPATH=.scratch/oracle python tools/pin_gccsd_t_rdm.py
"""
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
    from pyscf import cc as ref_cc
    from pyscf.cc import gccsd_t_lambda, gccsd_t_rdm, gccsd_t as ref_gt

    t0 = time.time()
    mf = oracle.reference_mf(OH, "sto-3g", kind="GHF", conv_tol=1e-12,
                             spin=1)
    mycc = ref_cc.GCCSD(mf)
    mycc.conv_tol = 1e-11
    mycc.conv_tol_normt = 1e-9
    mycc.max_cycle = 200
    eris = mycc.ao2mo()
    mycc.kernel(eris=eris)
    assert mycc.converged
    t1r, t2r = mycc.t1, mycc.t2
    et_ref = ref_gt.kernel(mycc, eris, t1r, t2r)
    conv, l1r, l2r = gccsd_t_lambda.kernel(mycc, eris, t1r, t2r)
    dm1_ref = gccsd_t_rdm.make_rdm1(mycc, t1r, t2r, l1r, l2r, eris)
    dm2_ref = gccsd_t_rdm.make_rdm2(mycc, t1r, t2r, l1r, l2r, eris)
    print(f"[{time.time()-t0:.1f}s] reference GCCSD Lambda(T)+RDMs done "
          f"(E(T)={et_ref:.12e})", flush=True)

    # ours on the SAME spinor orbitals + amplitudes.  The reference GHF
    # orders spinors by mo_energy; rebuild our GERIs from ITS mo_coeff.
    from pyscf_mpcc_tpu.cc import gccsd, gccsd_t_rdm as ours
    _, _, h_ao, eri_ao = oracle.our_integrals(OH, "sto-3g", spin=1)
    nao = h_ao.shape[0]
    C = np.asarray(mf.mo_coeff)
    Ca, Cb = C[:nao], C[nao:]
    t = (np.einsum("pqrs,pP,qQ->PQrs", eri_ao, Ca, Ca, optimize=True)
         + np.einsum("pqrs,pP,qQ->PQrs", eri_ao, Cb, Cb, optimize=True))
    g_chem = (np.einsum("PQrs,rR,sS->PQRS", t, Ca, Ca, optimize=True)
              + np.einsum("PQrs,rR,sS->PQRS", t, Cb, Cb, optimize=True))
    hso = Ca.T @ h_ao @ Ca + Cb.T @ h_ao @ Cb
    nocc = mf.mol.nelectron
    nso = hso.shape[0]
    # build a GERIs container from the reference orbitals
    dm = np.zeros((nso, nso))
    dm[np.arange(nocc), np.arange(nocc)] = 1.0
    j = np.einsum("pqrs,rs->pq", g_chem, dm)
    k = np.einsum("prqs,rs->pq", g_chem, dm)
    fock = hso + j - k
    phys = g_chem.transpose(0, 2, 1, 3)
    anti = phys - phys.transpose(0, 1, 3, 2)
    o, v = slice(0, nocc), slice(nocc, nso)
    sl = {"o": o, "v": v}
    blocks = {key: anti[tuple(sl[c] for c in key)]
              for key in gccsd.GERIs.BLOCKS}
    er = gccsd.GERIs(blocks, fock, nocc)
    t1 = jnp.asarray(t1r)
    t2 = jnp.asarray(t2r)
    et_ours = float(ours.e_t_g(t1, t2, er))
    cl, l1, l2 = ours.lambda_kernel_g(t1, t2, er, conv_tol=1e-9,
                                      max_cycle=200)
    assert cl
    d1, d2 = ours.make_rdm12(jnp.asarray(hso), jnp.asarray(g_chem),
                             t1, t2, l1, l2, nocc)

    def sym8(x):
        x = np.asarray(x)
        x = 0.5 * (x + x.transpose(1, 0, 2, 3))
        x = 0.5 * (x + x.transpose(0, 1, 3, 2))
        return 0.5 * (x + x.transpose(2, 3, 0, 1))

    print("PIN gccsd_t_rdm_oh " + json.dumps(dict(
        et_ref=float(et_ref), et_ours=et_ours,
        d_et=abs(et_ours - float(et_ref)),
        max_d_l1=float(np.abs(np.asarray(l1) - l1r).max()),
        max_d_rdm1=float(np.abs(np.asarray(d1) - dm1_ref).max()),
        max_d_rdm2=float(np.abs(sym8(d2) - sym8(dm2_ref)).max()),
        wall_s=round(time.time() - t0, 1))), flush=True)


if __name__ == "__main__":
    main()
