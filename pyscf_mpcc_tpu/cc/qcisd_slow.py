"""QCISD (quadratic CI with singles and doubles), spin-orbital form.

Role of the reference's cc/qcisd.py.  QCISD truncates the CCSD equations:

    <S| H + [H,T1] + [H,T2] + [[H,T2],T1] |0> = 0
    <D| H + [H,T1] + [H,T2] + 1/2 [[H,T2],T2] |0> = 0

i.e. the CCSD equations with every T1-nonlinear term removed: the doubles
see t1 only through the linear <ab||ej>/<mb||ij> terms, the singles keep
the t1.t2 cross terms but no t1^2.  Implemented by specializing the
validated gccsd_slow machinery.
"""

from __future__ import annotations

import numpy as np

from pyscf_mpcc_tpu.lib.diis import DIIS
from pyscf_mpcc_tpu.lib import logger as lg
from pyscf_mpcc_tpu.cc import gccsd_slow


def update_amps(t1, t2, eris):
    nocc = eris.nocc
    f = eris.fock
    fov = f[:nocc, nocc:]
    foo = f[:nocc, :nocc]
    fvv = f[nocc:, nocc:]
    eo = np.diag(foo)
    ev = np.diag(fvv)

    oovv = eris.block("oovv")
    ooov = eris.block("ooov")
    ovvv = eris.block("ovvv")
    oooo = eris.block("oooo")
    vvvv = eris.block("vvvv")
    ovov = eris.block("ovov")
    ovvo = eris.block("ovvo")
    ovoo = eris.block("ovoo")
    vvvo = eris.block("vvvo")
    oovo = -ooov.transpose(0, 1, 3, 2)

    # QCI intermediates: T2-only bodies
    Fae = (fvv - np.diag(ev)) - 0.5 * np.einsum("mnaf,mnef->ae", t2, oovv)
    Fmi = (foo - np.diag(eo)) + 0.5 * np.einsum("inef,mnef->mi", t2, oovv)
    Fme = fov + np.einsum("nf,mnef->me", t1, oovv)

    # --- singles: linear t1 + linear t2 + t1.t2 cross terms ---------------
    t1new = fov.copy()
    t1new += np.einsum("ie,ae->ia", t1, Fae)
    t1new -= np.einsum("ma,mi->ia", t1, Fmi)
    t1new += np.einsum("imae,me->ia", t2, Fme)
    t1new -= np.einsum("nf,naif->ia", t1, ovov)
    t1new -= 0.5 * np.einsum("imef,maef->ia", t2, ovvv)
    t1new -= 0.5 * np.einsum("mnae,nmei->ia", t2, oovo)

    # --- doubles: CCSD with t1 = 0 except the linear [H,T1] terms ---------
    Wmnij = oooo + 0.25 * np.einsum("ijef,mnef->mnij", t2, oovv)
    Wabef = vvvv + 0.25 * np.einsum("mnab,mnef->abef", t2, oovv)
    Wmbej = ovvo - 0.5 * np.einsum("jnfb,mnef->mbej", t2, oovv)

    t2new = oovv.copy()
    tmp = np.einsum("ijae,be->ijab", t2, fvv - np.diag(ev)
                    - 0.5 * np.einsum("mnbf,mnef->be", t2, oovv))
    t2new += tmp - tmp.transpose(0, 1, 3, 2)
    tmp = np.einsum("imab,mj->ijab", t2, foo - np.diag(eo)
                    + 0.5 * np.einsum("jnef,mnef->mj", t2, oovv))
    t2new -= tmp - tmp.transpose(1, 0, 2, 3)
    t2new += 0.5 * np.einsum("mnab,mnij->ijab", t2, Wmnij)
    t2new += 0.5 * np.einsum("ijef,abef->ijab", t2, Wabef)
    tmp = np.einsum("imae,mbej->ijab", t2, Wmbej)
    tmp = tmp - tmp.transpose(0, 1, 3, 2)
    t2new += tmp - tmp.transpose(1, 0, 2, 3)
    tmp = np.einsum("ie,abej->ijab", t1, vvvo)
    t2new += tmp - tmp.transpose(1, 0, 2, 3)
    tmp = np.einsum("ma,mbij->ijab", t1, ovoo)
    t2new -= tmp - tmp.transpose(0, 1, 3, 2)

    d1 = eo[:, None] - ev[None, :]
    d2 = (eo[:, None, None, None] + eo[None, :, None, None]
          - ev[None, None, :, None] - ev[None, None, None, :])
    return t1new / d1, t2new / d2


def energy(t1, t2, eris):
    """QCISD energy: E = sum f.t1 + 1/4 sum <ij||ab> t2 (no t1^2 term)."""
    nocc = eris.nocc
    fov = eris.fock[:nocc, nocc:]
    oovv = eris.block("oovv")
    return float(np.einsum("ia,ia->", fov, t1)
                 + 0.25 * np.einsum("ijab,ijab->", oovv, t2))


def kernel(eris, max_cycle=100, conv_tol=1e-9, conv_tol_normt=1e-7,
           diis_space=6, verbose=0):
    log = lg.Logger(verbose=verbose)
    emp2, t1, t2 = gccsd_slow.init_amps(eris)
    log.info("QCISD MP2 init E_corr = %.14f", emp2)
    diis = DIIS(space=diis_space)
    nocc, nvir = t1.shape
    e_last = energy(t1, t2, eris)
    converged = False
    e = e_last
    for it in range(max_cycle):
        t1n, t2n = update_amps(t1, t2, eris)
        normt = np.linalg.norm(t1n - t1) + np.linalg.norm(t2n - t2)
        vec = diis.update(np.concatenate([t1n.ravel(), t2n.ravel()]))
        t1 = vec[: nocc * nvir].reshape(nocc, nvir)
        t2 = vec[nocc * nvir:].reshape(t2.shape)
        e = energy(t1, t2, eris)
        log.info("cycle %2d  E_corr(QCISD) = %.14f  dE = %9.3e  |dt| = %9.3e",
                 it, e, e - e_last, normt)
        if abs(e - e_last) < conv_tol and normt < conv_tol_normt:
            converged = True
            break
        e_last = e
    return float(e), t1, t2, converged


def kernel_t(eris, **kw):
    """QCISD(T): converge QCISD, then the perturbative triples with the
    doubled disconnected-singles V (reference cc/qcisd_t.py, JCP 94, 442;
    lib/cc/ccsd_t.c QCIsd_t_contract fac=2.0).

    Returns (e_qcisd, e_t)."""
    from pyscf_mpcc_tpu.cc import gccsd_t_slow
    e, t1, t2, conv = kernel(eris, **kw)
    et = gccsd_t_slow.kernel(t1, t2, eris, v_fac=2.0)
    return float(e), float(et)
