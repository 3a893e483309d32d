"""Unrestricted MP2 (canonical + iterative non-canonical).

Capability match for the reference's mp/ump2.py: spin-blocked energies over
(gaa, gab, gbb) with the same antisymmetrized same-spin combinations as
cc.uccsd.init_amps, plus the DIIS-iterated non-canonical solver the
unrestricted MP-CC workflow needs (localized/ROHF Fock matrices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kernel_from_ueris(eris):
    """Canonical UMP2 energy + amplitudes from a cc.uccsd.UERIs container."""
    from pyscf_mpcc_tpu.cc import uccsd
    emp2, t1, t2 = uccsd.init_amps(eris)
    return float(emp2), t2


@jax.jit
def update_amps(t2, g, fooa, foob, fvva, fvvb):
    """Non-canonical Jacobi sweep for (t2aa, t2ab, t2bb).

    g = (gaa, gab, gbb): antisymmetrized (same-spin) / plain (ab) MO
    integrals in physicists' oovv layout."""
    t2aa, t2ab, t2bb = t2
    gaa, gab, gbb = g
    eoa = jnp.diagonal(fooa)
    eob = jnp.diagonal(foob)
    eva = jnp.diagonal(fvva)
    evb = jnp.diagonal(fvvb)

    def resid(t2x, gx, foo1, foo2, fvv1, fvv2):
        r = gx
        r = r + jnp.einsum("ac,ijcb->ijab", fvv1, t2x)
        r = r + jnp.einsum("bc,ijac->ijab", fvv2, t2x)
        r = r - jnp.einsum("ik,kjab->ijab", foo1, t2x)
        r = r - jnp.einsum("jk,ikab->ijab", foo2, t2x)
        return r

    def dd(eo1, eo2, ev1, ev2):
        return (eo1[:, None, None, None] + eo2[None, :, None, None]
                - ev1[None, None, :, None] - ev2[None, None, None, :])

    raa = resid(t2aa, gaa, fooa, fooa, fvva, fvva)
    rab = resid(t2ab, gab, fooa, foob, fvva, fvvb)
    rbb = resid(t2bb, gbb, foob, foob, fvvb, fvvb)
    t2aa = t2aa + raa / dd(eoa, eoa, eva, eva)
    t2ab = t2ab + rab / dd(eoa, eob, eva, evb)
    t2bb = t2bb + rbb / dd(eob, eob, evb, evb)
    return (t2aa, t2ab, t2bb), (raa, rab, rbb)


def energy(t2, g):
    t2aa, t2ab, t2bb = t2
    gaa, gab, gbb = g
    e = 0.25 * jnp.einsum("ijab,ijab->", t2aa, gaa)
    e += 0.25 * jnp.einsum("ijab,ijab->", t2bb, gbb)
    e += jnp.einsum("ijab,ijab->", t2ab, gab)
    return float(e)


def iterative_kernel(eris, max_cycle=100, conv_tol=1e-9, diis_space=6,
                     verbose=0):
    """Non-canonical iterative UMP2 from a UERIs container."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    from pyscf_mpcc_tpu.cc import uccsd
    log = lg.Logger(verbose=verbose)
    na, nb = uccsd._nocc(eris)
    gaa = eris.ovov.transpose(0, 2, 1, 3) - eris.ovov.transpose(0, 2, 3, 1)
    gbb = eris.OVOV.transpose(0, 2, 1, 3) - eris.OVOV.transpose(0, 2, 3, 1)
    gab = eris.ovOV.transpose(0, 2, 1, 3)
    g = (gaa, gab, gbb)
    fooa = eris.focka[:na, :na]
    fvva = eris.focka[na:, na:]
    foob = eris.fockb[:nb, :nb]
    fvvb = eris.fockb[nb:, nb:]
    t2 = tuple(jnp.zeros_like(x) for x in g)
    diis = DIIS(space=diis_space)
    e_last = 0.0
    converged = False
    shapes = [x.shape for x in g]
    sizes = [int(np.prod(s)) for s in shapes]
    for it in range(max_cycle):
        t2, r = update_amps(t2, g, fooa, foob, fvva, fvvb)
        vec = np.concatenate([np.asarray(x).ravel() for x in t2])
        err = np.concatenate([np.asarray(x).ravel() for x in r])
        vec = diis.update(vec, xerr=err)
        out, p = [], 0
        for s, n in zip(shapes, sizes):
            out.append(jnp.asarray(vec[p:p + n].reshape(s)))
            p += n
        t2 = tuple(out)
        e = energy(t2, g)
        log.info("UMP2 cycle %d  E = %.12f  dE = %.3e", it, e, e - e_last)
        if abs(e - e_last) < conv_tol:
            converged = True
            break
        e_last = e
    return e, t2, converged


def scs_energy(eris, css=1.0 / 3.0, cos=1.2):
    """SCS-UMP2 (Grimme factors by default), reference dfmp2_native SCS."""
    from pyscf_mpcc_tpu.cc import uccsd
    emp2, t1, t2 = uccsd.init_amps(eris)
    gaa = eris.ovov.transpose(0, 2, 1, 3) - eris.ovov.transpose(0, 2, 3, 1)
    gbb = eris.OVOV.transpose(0, 2, 1, 3) - eris.OVOV.transpose(0, 2, 3, 1)
    gab = eris.ovOV.transpose(0, 2, 1, 3)
    e_ss = float(0.25 * jnp.einsum("ijab,ijab->", t2[0], gaa)
                 + 0.25 * jnp.einsum("ijab,ijab->", t2[2], gbb))
    e_os = float(jnp.einsum("ijab,ijab->", t2[1], gab))
    return css * e_ss + cos * e_os, e_ss, e_os


def df_kernel(mo_energy, Lov_a, Lov_b):
    """DF-UMP2 from per-spin 3-center MO factors (reference mp/dfump2.py
    role): mo_energy = ((eoa, eva), (eob, evb)); Lov_s = B[L, i_s, a_s].

    Returns (e_total, (e_aa, e_ab, e_bb))."""
    (eoa, eva), (eob, evb) = mo_energy
    gaa = jnp.einsum("Lia,Ljb->iajb", Lov_a, Lov_a)
    gbb = jnp.einsum("Lia,Ljb->iajb", Lov_b, Lov_b)
    gab = jnp.einsum("Lia,Ljb->iajb", Lov_a, Lov_b)

    def d(eo1, ev1, eo2, ev2):
        return (eo1[:, None, None, None] - ev1[None, :, None, None]
                + eo2[None, None, :, None] - ev2[None, None, None, :])

    taa = (gaa - gaa.transpose(0, 3, 2, 1)) / d(eoa, eva, eoa, eva)
    tbb = (gbb - gbb.transpose(0, 3, 2, 1)) / d(eob, evb, eob, evb)
    tab = gab / d(eoa, eva, eob, evb)
    e_aa = 0.25 * jnp.einsum("iajb,iajb->", taa,
                             gaa - gaa.transpose(0, 3, 2, 1))
    e_bb = 0.25 * jnp.einsum("iajb,iajb->", tbb,
                             gbb - gbb.transpose(0, 3, 2, 1))
    e_ab = jnp.einsum("iajb,iajb->", tab, gab)
    return (float(e_aa + e_bb + e_ab),
            (float(e_aa), float(e_ab), float(e_bb)))


def df_kernel_from_scf(mf, frozen=0):
    """DF-UMP2 driver from a (UHF or RHF) mean field carrying a DF object."""
    import numpy as _np
    B = jnp.asarray(mf.with_df.B_ao())
    mo = _np.asarray(mf.mo_coeff)
    moe = _np.asarray(mf.mo_energy)
    if mo.ndim == 2:
        mo = _np.array([mo, mo])
        moe = _np.array([moe, moe])
    na, nb = mf.mol.nelec
    f = int(frozen or 0)
    Ls = []
    ens = []
    for s, no in ((0, na), (1, nb)):
        co = jnp.asarray(mo[s][:, f:no])
        cv = jnp.asarray(mo[s][:, no:])
        Ls.append(jnp.einsum("Lpq,pi,qa->Lia", B, co, cv))
        ens.append((jnp.asarray(moe[s][f:no]), jnp.asarray(moe[s][no:])))
    return df_kernel((ens[0], ens[1]), Ls[0], Ls[1])
