"""MPCC(mf) facade: low-level solver on init + high-level kernel."""

import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.mpcc import MPCC
from pyscf_mpcc_tpu.scf import RHF

E_MP2_DF_ETB_TOL = 1e-3  # low-level energy should be near MP2 scale


def test_mpcc_facade_end_to_end():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol).density_fit("etb")
    mf.conv_tol = 1e-11
    mf.kernel()
    m = MPCC(mf)
    # low-level solver ran on init
    assert m.e_lowlevel is not None
    assert -0.2 < m.e_lowlevel < -0.01
    # high-level MP-CC on a small active space
    e = m.kernel(act_hole=[2, 3, 4], act_particle=[0, 1],
                 idx_s=[], idx_d=list(range(15)),
                 conv_tol=1e-9, conv_tol_normt=1e-7, max_cycle=100)
    assert m.converged
    # between MP2 and CCSD magnitudes for this system
    assert -0.08 < e < -0.03
