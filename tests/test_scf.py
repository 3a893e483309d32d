import numpy as np

from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

# Reference pinned value: pyscf/scf/test/test_rhf.py:372
E_RHF_H2O_CCPVDZ = -76.026765673119627


def test_rhf_h2o_ccpvdz():
    d = h2o_ccpvdz()
    assert abs(float(d["e_tot"]) - E_RHF_H2O_CCPVDZ) < 1e-9


def test_uhf_matches_rhf_closed_shell():
    from pyscf_mpcc_tpu.testutil import mol_of
    from pyscf_mpcc_tpu.scf import UHF
    mol = mol_of(basis="sto-3g")
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    e = mf.kernel()
    from pyscf_mpcc_tpu.scf import RHF
    mf2 = RHF(mol)
    mf2.conv_tol = 1e-12
    e2 = mf2.kernel()
    assert abs(e - e2) < 1e-8


def test_rohf_triplet_o2_runs():
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import ROHF, UHF
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = ROHF(mol)
    mf.conv_tol = 1e-10
    e_ro = mf.kernel()
    assert mf.converged
    # pinned converged energy (diagonal Roothaan blocks do not move the
    # stationary point, so this anchors the SCF solution itself)
    assert abs(e_ro - -147.63227466131738) < 1e-8
    mfu = UHF(mol)
    mfu.conv_tol = 1e-10
    e_u = mfu.kernel()
    assert mfu.converged
    # UHF is variationally below (or equal to) ROHF
    assert e_u <= e_ro + 1e-9


def test_rohf_roothaan_mo_energy_blocks():
    """The Roothaan effective Fock's diagonal blocks all carry fc=(fa+fb)/2
    with coefficient 1.0 (reference get_roothaan_fock symmetrized algebra);
    a 0.5 on the open-open block would halve the SOMO orbital energies."""
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import ROHF
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = ROHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    assert mf.converged
    na, nb = mol.nelec
    dm = mf.make_rdm1()
    f = mf.get_fock(dm)
    fc = 0.5 * (f[0] + f[1])
    c = mf.mo_coeff[0]
    e = mf.mo_energy[0]
    for sl in (slice(0, nb), slice(nb, na), slice(na, None)):
        blk = c[:, sl]
        assert np.abs(np.diag(blk.T @ fc @ blk) - e[sl]).max() < 1e-8
    # pinned SOMO orbital energy (doubly degenerate pi*), verified against
    # the reference pyscf/scf/rohf.py get_roothaan_fock construction
    assert np.allclose(e[nb:na], -0.07158887, atol=2e-6)


def test_ediis_adiis_schemes_reach_cdiis_energy():
    """EDIIS/ADIIS (+hybrids) converge H2O to the CDIIS fixed point
    (reference scf/diis.py EDIIS/ADIIS roles)."""
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF, UHF
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf0 = RHF(mol)
    mf0.conv_tol = 1e-11
    mf0.kernel()
    assert mf0.converged
    for scheme in ("ediis", "adiis", "ediis+cdiis", "adiis+cdiis"):
        mf = RHF(mol)
        mf.conv_tol = 1e-11
        mf.diis_scheme = scheme
        mf.max_cycle = 200
        mf.kernel()
        assert mf.converged, scheme
        assert abs(mf.e_tot - mf0.e_tot) < 1e-8, scheme
    molu = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mu0 = UHF(molu)
    mu0.conv_tol = 1e-11
    mu0.kernel()
    mu = UHF(molu)
    mu.conv_tol = 1e-11
    mu.diis_scheme = "adiis+cdiis"
    mu.max_cycle = 200
    mu.kernel()
    assert mu.converged
    assert abs(mu.e_tot - mu0.e_tot) < 1e-8
