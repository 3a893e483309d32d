"""End-to-end fragmented MP-CC pipeline tests (flagship workflow).

Oracle strategy as the reference's examples (n2_rohf_umpccsd.py:327-345):
a single fragment covering the whole molecule with nothing frozen must
reproduce global CCSD (energy is invariant under the occupied/virtual
localization rotations); partial freezes land between MP2 and CCSD."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.lo.pm import lowdin_populations, pm_localize
from pyscf_mpcc_tpu.mpcc import workflow
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz, mol_of

E_MP2 = -0.2040199672883385
E_CCSD = -0.2133432312951


def _mf():
    d = h2o_ccpvdz()
    mol = mol_of()
    mf = RHF(mol)
    # restore cached solution instead of re-solving
    mf.mo_coeff = d["mo_coeff"]
    mf.mo_energy = d["mo_energy"]
    mf.mo_occ = d["mo_occ"]
    mf.converged = True
    mf.e_tot = float(d["e_tot"])
    return mol, mf, d


def test_pm_localization_preserves_span():
    mol, mf, d = _mf()
    C = mf.mo_coeff[:, :5]
    C_loc, U = pm_localize(mol, C, S=mf.S)
    # unitary within the block
    assert np.abs(U.T @ U - np.eye(5)).max() < 1e-10
    # localization increases the PM metric vs canonical
    q0 = (lowdin_populations(mol, C, S=mf.S) ** 2).sum()
    q1 = (lowdin_populations(mol, C_loc, S=mf.S) ** 2).sum()
    assert q1 >= q0 - 1e-12


def test_full_fragment_no_freeze_equals_ccsd():
    mol, mf, d = _mf()
    e, t1, t2, c_loc, spaces = workflow.fragmented_mpcc(
        mol, mf, fragments=[[0, 1, 2]], idx_s=[], idx_d=[],
        eri_ao=d["eri_ao"], pop_threshold=-1.0, cc_conv=1e-9)
    assert abs(e - E_CCSD) < 1e-6


def test_partial_freeze_between_mp2_and_ccsd():
    mol, mf, d = _mf()
    # fragment = oxygen only; freeze everything except all-active doubles
    e, t1, t2, c_loc, spaces = workflow.fragmented_mpcc(
        mol, mf, fragments=[[0]], idx_s=[], idx_d=list(range(15)),
        eri_ao=d["eri_ao"], pop_threshold=0.3, cc_conv=1e-9)
    act_hole, act_particle = spaces[0]
    assert len(act_hole) >= 1
    assert E_CCSD - 1e-7 <= e <= E_MP2 + 1e-7


# ---------------------------------------------------------------------------
# Unrestricted flagship pipeline (reference n2_rohf_umpccsd.py:300)

def _o2_uhf():
    from pyscf_mpcc_tpu.scf import UHF
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    return mol, mf


def test_u_full_fragment_no_freeze_equals_uccsd():
    from pyscf_mpcc_tpu.cc import uccsd
    mol, mf = _o2_uhf()
    # global canonical UCCSD oracle
    ue = uccsd.eris_from_scf(mf)
    _, e_ref, _, _ = uccsd.kernel(ue, conv_tol=1e-10, conv_tol_normt=1e-8)
    e, t1, t2, c_loc, spaces = workflow.fragmented_mpcc_unrestricted(
        mol, mf, fragments=[[0, 1]], idx_s=[], idx_d=[],
        pop_threshold=-1.0, cc_conv=1e-10)
    # correlation energy is invariant under per-spin occ/vir rotations
    assert abs(e - e_ref) < 1e-7
    (aha, ahb), (apa, apb) = spaces[0]
    assert len(aha) == mol.nelec[0] and len(ahb) == mol.nelec[1]


def test_u_partial_freeze_between_ump2_and_uccsd():
    from pyscf_mpcc_tpu.cc import uccsd
    from pyscf_mpcc_tpu.mp import ump2
    mol, mf = _o2_uhf()
    ue = uccsd.eris_from_scf(mf)
    e_mp2, _, _ = uccsd.init_amps(ue)
    _, e_cc, _, _ = uccsd.kernel(ue, conv_tol=1e-10, conv_tol_normt=1e-8)
    # one-atom fragment; freeze the all-inactive doubles block only
    e, t1, t2, c_loc, spaces = workflow.fragmented_mpcc_unrestricted(
        mol, mf, fragments=[[0]], idx_s=[], idx_d=list(range(15)),
        pop_threshold=0.3, cc_conv=1e-9)
    assert e_cc - 1e-6 <= e <= float(e_mp2) + 1e-6


def test_u_oo_mp2_bath_relaxation_runs():
    mol, mf = _o2_uhf()
    e, t1, t2, c_loc, spaces = workflow.fragmented_mpcc_unrestricted(
        mol, mf, fragments=[[0]], idx_s=[], idx_d=list(range(15)),
        pop_threshold=0.3, cc_conv=1e-8, oo_mp2_relax=True)
    assert np.isfinite(e)
