"""QCISD(+T) — device production tier.

Role of the reference's production RHF-QCISD (pyscf/cc/qcisd.py:33 +
qcisd_t.py:1).  TPU-first composition instead of a re-derived
spin-adapted update:

  * the QCISD equations run on the DEVICE spin-orbital engine —
    cc/gccsd.py's fused jitted update with variant='qcisd' (the QCI
    truncation of the Stanton set, oracle-locked against
    cc/qcisd_slow.py which carries the reference-pinned CH4 value);
  * for a closed-shell reference the converged spin-orbital amplitudes
    map exactly onto restricted ones (t1R = t1G[alpha,alpha],
    t2R[ijab] = t2G[ia jb, aa bb]-mixed-spin), and QCISD(T) is the
    PRODUCTION restricted triples engine cc/ccsd_t.py with vfac=2 — the
    reference's own relationship (lib/cc/ccsd_t.c:478 QCIsd_t_contract
    == CCsd_t_contract with fac=2.0; JCP 94, 442 (1991)).

So the expensive O(o^3 v^4)-class (T) step rides the same Pallas tile
engines (fused/flat, mesh-shardable) as CCSD(T); only the iterative
QCISD solve itself runs in the 16x-storage spin-orbital frame, which
covers the method's practical molecule sizes.
"""

from __future__ import annotations

import numpy as np


def make_geris_rhf(mf, frozen=0):
    """Spin-orbital GERIs from a closed-shell RHF with the FIXED spinor
    layout [occ-alpha, occ-beta, vir-alpha, vir-beta] (no energy sort:
    the closed-shell amplitude map below needs deterministic spin
    blocks).  frozen = number of frozen spatial core orbitals."""
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.cc.gccsd import GERIs
    mol = mf.mol
    C = np.asarray(mf.mo_coeff)[:, int(frozen):]
    no = mol.nelectron // 2 - int(frozen)
    nmo = C.shape[1]
    nv = nmo - no
    co, cv = C[:, :no], C[:, no:]

    eri = gto.intor_eri(mol)
    # spatial MO eri once; spin blocks assembled from it
    mo_eri = np.einsum("pqrs,pP,qQ,rR,sS->PQRS", eri, C, C, C, C,
                       optimize=True)
    phys = mo_eri.transpose(0, 2, 1, 3)       # <pq|rs>
    nso = 2 * nmo

    # spinor index s -> (spatial index, spin): layout
    # [occA(0..no) occB virA virB]
    spat = np.concatenate([np.arange(no), np.arange(no),
                           np.arange(no, nmo), np.arange(no, nmo)])
    spin = np.concatenate([np.zeros(no), np.ones(no),
                           np.zeros(nv), np.ones(nv)]).astype(int)
    d = spin[:, None] == spin[None, :]
    phys_so = phys[np.ix_(spat, spat, spat, spat)]
    # <PQ||RS> = <pq|rs> d(sP,sR) d(sQ,sS) - <pq|sr> d(sP,sS) d(sQ,sR)
    anti = (phys_so * d[:, None, :, None] * d[None, :, None, :]
            - phys_so.transpose(0, 1, 3, 2)
            * d[:, None, None, :] * d[None, :, :, None])

    f_ao = mf.get_fock(mf.make_rdm1())
    f_mo = C.T @ f_ao @ C
    fock = f_mo[np.ix_(spat, spat)] * d

    nocc = 2 * no
    o, v = slice(0, nocc), slice(nocc, nso)
    sl = {"o": o, "v": v}
    blocks = {k: anti[tuple(sl[c] for c in k)] for k in GERIs.BLOCKS}
    return GERIs(blocks, fock, nocc)


def map_closed_shell(t1g, t2g, no, nv):
    """Restricted (t1, t2) from closed-shell spin-orbital amplitudes in
    the make_geris_rhf layout: t1R[i,a] = t1G[i_a, a_a];
    t2R[i,j,a,b] = t2G[i_a, j_b, a_a, b_b] (the mixed-spin block — the
    standard closed-shell identification)."""
    t1g = np.asarray(t1g)
    t2g = np.asarray(t2g)
    t1 = t1g[:no, :nv]
    t2 = t2g[:no, no:, :nv, nv:]
    return t1, t2


class QCISD:
    """Driver facade: ``QCISD(rhf_mf).run()`` then ``.ccsd_t()``.

    run() converges device spin-orbital QCISD; ccsd_t() maps the
    amplitudes to the restricted frame and evaluates the (T) correction
    with the production tile engine at vfac=2."""

    conv_tol = 1e-9
    conv_tol_normt = 1e-7
    max_cycle = 100

    def __init__(self, mf, frozen=0, verbose=None):
        self.mf = mf
        self.frozen = int(frozen)
        self.verbose = (getattr(mf, "verbose", 0)
                        if verbose is None else verbose)
        self.converged = False
        self.e_corr = None
        self.t1 = self.t2 = None
        self._geris = None

    def kernel(self):
        from pyscf_mpcc_tpu.cc import gccsd
        self._geris = make_geris_rhf(self.mf, self.frozen)
        e, t1, t2, conv = gccsd.kernel(
            self._geris, max_cycle=self.max_cycle,
            conv_tol=self.conv_tol, conv_tol_normt=self.conv_tol_normt,
            verbose=self.verbose, variant="qcisd")
        self.e_corr, self.t1, self.t2, self.converged = e, t1, t2, conv
        return self

    run = kernel

    def ccsd_t(self, tile=4, **kw):
        """The QCISD(T) correction via the restricted production engine
        (ccsd_t.kernel, vfac=2) on the mapped amplitudes."""
        from pyscf_mpcc_tpu import gto
        from pyscf_mpcc_tpu.cc import ccsd_t, eris as eris_mod
        mf = self.mf
        no = mf.mol.nelectron // 2 - self.frozen
        C = np.asarray(mf.mo_coeff)[:, self.frozen:]
        nv = C.shape[1] - no
        t1, t2 = map_closed_shell(self.t1, self.t2, no, nv)
        er = eris_mod.make_eris_incore(
            gto.intor_eri(mf.mol), C,
            np.asarray(mf.get_fock(mf.make_rdm1())), no)
        return float(ccsd_t.kernel(t1, t2, er, tile=tile, vfac=2.0, **kw))

    @property
    def e_tot(self):
        return float(self.mf.e_tot) + float(self.e_corr)
