"""DF-GMP2 (mp/dfgmp2.py): reference-pinned parity + DF cross-checks.

The pinned values come from the reference's own mp/dfgmp2.py running on
this host (libcint-free oracle build, tools/build_reference_oracle.sh)
with the DF factors injected from OUR df engine, so both codes see
bit-identical (P|ia) factors and the comparison isolates the DF-GMP2
algorithm itself (reference dfgmp2.kernel :33)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.mp.dfgmp2 import DFGMP2
from pyscf_mpcc_tpu.scf import RHF, UHF

H2O = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"

# PIN h2o_<basis>_dfgmp2 from tools/pin_reference_values.py (2026-08-19)
REF = {
    "sto-3g": dict(e_corr=-0.035490285389463326, e_scf=-74.96302313846306),
    "631g": dict(e_corr=-0.12877271226149506, e_scf=-75.9839744727218),
}


def _mf(basis):
    mol = gto.M(atom=H2O, basis=basis, unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.kernel()
    return mf


@pytest.mark.parametrize("basis", ["sto-3g", "631g"])
def test_dfgmp2_matches_reference(basis):
    mf = _mf(basis)
    assert abs(mf.e_tot - REF[basis]["e_scf"]) < 1e-9
    pt = DFGMP2(mf).run()
    assert abs(pt.e_corr - REF[basis]["e_corr"]) < 1e-9


def _canonical_fock_ao(mf):
    """AO Fock whose MO transform is exactly diag(mo_energy) -- keeps
    the incore-GMP2 denominators identical to the DF path's (after
    density_fit, mf.get_fock would return the slightly different DF
    Fock)."""
    S = np.asarray(mf.get_ovlp())
    C = np.asarray(mf.mo_coeff)
    return S @ C @ np.diag(np.asarray(mf.mo_energy)) @ C.T @ S


def test_dfgmp2_equals_gmp2_on_df_integrals():
    # exact cross-check: incore spin-orbital GMP2 on the DF-reconstructed
    # AO ERI must equal DFGMP2 built from the same B factors
    from pyscf_mpcc_tpu.cc import gccsd_slow
    from pyscf_mpcc_tpu.mp import gmp2

    mf = _mf("sto-3g")
    pt = DFGMP2(mf).run()
    B = np.asarray(mf.with_df.B_ao())
    eri_df = np.einsum("Lpq,Lrs->pqrs", B, B)
    f = _canonical_fock_ao(mf)
    mo = np.asarray(mf.mo_coeff)
    eris = gccsd_slow.build_eris(eri_df, mo, mo, (f, f), mf.mol.nelec)
    e_ref, t2_ref = gmp2.kernel(eris)
    assert abs(pt.e_corr - e_ref) < 1e-11
    # amplitudes agree up to the (same) spin-orbital ordering
    assert float(jnp.abs(pt.t2 - jnp.asarray(t2_ref)).max()) < 1e-10


def test_dfgmp2_frozen_core_cross_check():
    from pyscf_mpcc_tpu.cc import gccsd_slow
    from pyscf_mpcc_tpu.mp import gmp2

    mf = _mf("sto-3g")
    pt = DFGMP2(mf, frozen=1).run()
    B = np.asarray(mf.with_df.B_ao())
    eri_df = np.einsum("Lpq,Lrs->pqrs", B, B)
    f = _canonical_fock_ao(mf)
    mo = np.asarray(mf.mo_coeff)
    na, nb = mf.mol.nelec
    eris = gccsd_slow.build_eris(eri_df, mo[:, 1:], mo[:, 1:], (f, f),
                                 (na - 1, nb - 1))
    e_ref, _ = gmp2.kernel(eris)
    assert abs(pt.e_corr - e_ref) < 1e-11
    # frozen-core correlation is strictly smaller in magnitude
    assert abs(pt.e_corr) < abs(DFGMP2(mf).run().e_corr)


def test_dfgmp2_uhf_reference():
    mol = gto.M(atom="O 0 0 0; H 0 0 0.97", basis="sto-3g",
                unit="angstrom", spin=1)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    pt = DFGMP2(mf).run()
    # cross-check vs incore GMP2 on DF-reconstructed integrals
    from pyscf_mpcc_tpu.cc import gccsd_slow
    from pyscf_mpcc_tpu.mp import gmp2
    B = np.asarray(mf.with_df.B_ao())
    eri_df = np.einsum("Lpq,Lrs->pqrs", B, B)
    S = np.asarray(mf.get_ovlp())
    mo = np.asarray(mf.mo_coeff)
    me = np.asarray(mf.mo_energy)
    fa = S @ mo[0] @ np.diag(me[0]) @ mo[0].T @ S
    fb = S @ mo[1] @ np.diag(me[1]) @ mo[1].T @ S
    eris = gccsd_slow.build_eris(eri_df, mo[0], mo[1], (fa, fb),
                                 mf.mol.nelec)
    e_ref, _ = gmp2.kernel(eris)
    assert abs(pt.e_corr - e_ref) < 1e-11


def test_dfgmp2_rdm1_energy_consistency():
    # Tr(h dm1)/trace sanity through the gmp2 rdm builders
    mf = _mf("sto-3g")
    pt = DFGMP2(mf).run()
    dm1 = pt.make_rdm1()
    assert abs(np.trace(dm1) - mf.mol.nelectron) < 1e-9
