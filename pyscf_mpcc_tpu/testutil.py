"""Shared test fixtures: cached molecules / SCF solutions / integrals.

Integral generation is O(minutes) for the larger test systems; cache the
expensive artifacts in ``.scratch/fixtures`` keyed by a content hash so the
test suite stays fast.  Pure convenience for tests and benchmarks.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch", "fixtures")


def _key(*parts):
    return hashlib.sha1("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


def cached(name, builder, *key_parts):
    """Build-or-load a dict of numpy arrays."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"{name}-{_key(*key_parts)}.npz")
    if os.path.exists(path):
        with np.load(path) as f:
            return dict(f)
    out = builder()
    np.savez(path, **out)
    return out


def h2o_ccpvdz(geom="sym"):
    """H2O/cc-pVDZ RHF solution + AO integrals (the reference's test_h2o
    system, pyscf/cc/test/test_h2o.py:35-44).  geom='tilt' is the distorted
    geometry of the (T) pinned value (pyscf/cc/ccsd_t.py:241)."""
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF

    if geom == "sym":
        atom = [[8, (0., 0., 0.)], [1, (0., -0.757, 0.587)], [1, (0., 0.757, 0.587)]]
    else:
        atom = [[8, (0., 0., 0.)], [1, (0., -0.957, 0.587)], [1, (0.2, 0.757, 0.487)]]

    def build():
        mol = gto.M(atom=atom, basis="cc-pvdz")
        mf = RHF(mol)
        mf.conv_tol = 1e-13
        mf.conv_tol_grad = 1e-10
        mf.kernel()
        eri = gto.intor_eri(mol)
        dm = mf.make_rdm1()
        fock = mf.get_fock(dm)
        return dict(mo_coeff=mf.mo_coeff, mo_energy=mf.mo_energy,
                    mo_occ=mf.mo_occ, e_tot=np.array(mf.e_tot),
                    fock_ao=fock, eri_ao=eri, hcore=mf.get_hcore(),
                    ovlp=mf.S, e_nuc=np.array(mf.e_nuc))

    data = cached("h2o-ccpvdz", build, geom)
    data["nocc"] = 5
    return data


def mol_of(geom="sym", basis="cc-pvdz"):
    from pyscf_mpcc_tpu import gto
    if geom == "sym":
        atom = [[8, (0., 0., 0.)], [1, (0., -0.757, 0.587)], [1, (0., 0.757, 0.587)]]
    else:
        atom = [[8, (0., 0., 0.)], [1, (0., -0.957, 0.587)], [1, (0.2, 0.757, 0.487)]]
    return gto.M(atom=atom, basis=basis)
