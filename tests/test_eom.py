"""EOM-EE-CCSD tests.

Oracle: for a two-electron system CCSD is exact (= FCI), so EOM-EE-CCSD
excitation energies must match full CI.  A tiny singlet FCI in the MO
product basis provides the reference."""

import numpy as np
import jax.numpy as jnp

from pyscf_mpcc_tpu import ao2mo, gto
from pyscf_mpcc_tpu.cc import eom, eris as eris_mod, rccsd
from pyscf_mpcc_tpu.scf import RHF


def _h2():
    mol = gto.M(atom="H 0 0 0; H 0 0 0.74", basis="6-31g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    return mol, mf


def _fci_singlet_energies(mol, mf):
    """Exact singlet spectrum of the 2-electron Hamiltonian in MO basis."""
    eri_ao = gto.intor_eri(mol)
    mo = mf.mo_coeff
    nmo = mo.shape[1]
    h_mo = mo.T @ (mf.hcore) @ mo
    g = np.asarray(ao2mo.full(jnp.asarray(eri_ao), jnp.asarray(mo)))
    # singlet two-electron basis: |pq> symmetric, p <= q
    pairs = [(p, q) for p in range(nmo) for q in range(p, nmo)]
    npair = len(pairs)
    H = np.zeros((npair, npair))
    for I, (p, q) in enumerate(pairs):
        for J, (r, s) in enumerate(pairs):
            # <pq|H|rs> on symmetrized products
            def me(p, q, r, s):
                v = 0.0
                if q == s:
                    v += h_mo[p, r]
                if p == r:
                    v += h_mo[q, s]
                v += g[p, r, q, s]
                return v
            norm_I = np.sqrt(2.0) if p == q else 1.0
            norm_J = np.sqrt(2.0) if r == s else 1.0
            val = 0.5 * (me(p, q, r, s) + me(p, q, s, r)
                         + me(q, p, r, s) + me(q, p, s, r))
            H[I, J] = val / (norm_I * norm_J)
    w = np.linalg.eigvalsh(H)
    return w + mol.energy_nuc()


def test_ee_eom_matches_fci_for_two_electrons():
    mol, mf = _h2()
    eri_ao = gto.intor_eri(mol)
    er = eris_mod.make_eris_incore(eri_ao, mf.mo_coeff,
                                   mf.get_fock(mf.make_rdm1()), 1)
    conv, e_corr, t1, t2 = rccsd.kernel(er, conv_tol=1e-12,
                                        conv_tol_normt=1e-11, max_cycle=100)
    assert conv
    fci = _fci_singlet_energies(mol, mf)
    e_ground = mf.e_tot + e_corr
    # CCSD ground state == FCI for 2 electrons
    assert abs(e_ground - fci[0]) < 1e-8

    convs, omegas, vecs = eom.kernel_ee(t1, t2, er, nroots=2, tol=1e-7)
    fci_gaps = fci[1:] - fci[0]
    for k in range(2):
        assert convs[k]
        assert abs(omegas[k] - fci_gaps[k]) < 1e-6


def test_ee_eom_uccsd_matches_det_fci():
    """U-EE covers both spin sectors; for two electrons all roots are exact
    eigenstates of the determinant-space FCI."""
    from pyscf_mpcc_tpu.cc import eom_slow, gccsd_slow, uccsd
    from pyscf_mpcc_tpu.ci.fci_slow import FCI
    mol, mf = _h2()
    eri_ao = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    ue = uccsd.make_eris_incore(eri_ao, mf.mo_coeff, mf.mo_coeff, f, f, 1, 1)
    conv, e, t1u, t2u = uccsd.kernel(ue, conv_tol=1e-12,
                                     conv_tol_normt=1e-11, max_cycle=100)
    assert conv
    from pyscf_mpcc_tpu.cc import eom
    convs, omegas, _ = eom.kernel_ee_u(t1u, t2u, ue, nroots=4, tol=1e-7)
    # exact spectrum from determinant FCI (all spin sectors)
    so = gccsd_slow.eris_from_scf(mf)
    h_so = eom_slow.h_so_from_eris(so)
    fci = FCI(h_so, so.ints, 2, so.nso)
    w, _ = fci.kernel(nroots=16)
    gaps = np.unique(np.round(w[1:] - w[0], 9))
    for k in range(4):
        assert convs[k]
        assert np.min(np.abs(gaps - omegas[k])) < 1e-6


def test_spin_flip_matches_triplet_ms_degeneracy():
    """SF-EOM (Ms=-1) roots from a closed-shell reference must be
    degenerate with the Ms=0 triplet roots of the spin-blocked EE
    solver — the defining spin-symmetry check for kernel_sf."""
    import numpy as np
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF
    from pyscf_mpcc_tpu.cc import eom, gccsd_slow
    from pyscf_mpcc_tpu.cc.driver import UCCSDDriver

    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()

    er = gccsd_slow.eris_from_scf(mf)
    _, t1g, t2g, _ = gccsd_slow.kernel(er, conv_tol=1e-11,
                                       conv_tol_normt=1e-9)
    conv, e_sf, _ = eom.kernel_sf(t1g, t2g, er, nroots=1, tol=1e-7)
    assert conv[0]

    cc = UCCSDDriver(mf).set(conv_tol=1e-11, conv_tol_normt=1e-9)
    cc.kernel()
    _, e_ee, _ = eom.kernel_ee_u(cc.t1, cc.t2, cc.eris, nroots=2,
                                 tol=1e-7)
    # lowest EE root of the spin-blocked solver is the Ms=0 triplet
    assert abs(e_sf[0] - e_ee[0]) < 5e-6
