import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import gccsd_slow, qcisd_slow
from pyscf_mpcc_tpu.scf import RHF
from pyscf_mpcc_tpu.testutil import cached

# pyscf/cc/test/test_qcisd.py:63
E_TOT_CH4 = -40.3839884


def test_qcisd_ch4_pinned():
    def build():
        mol = gto.M(atom="""C  0.000  0.000  0.000
                            H  0.637  0.637  0.637
                            H -0.637 -0.637  0.637
                            H -0.637  0.637 -0.637
                            H  0.637 -0.637 -0.637""", basis="cc-pvdz")
        mf = RHF(mol)
        mf.conv_tol = 1e-12
        mf.conv_tol_grad = 1e-9
        mf.kernel()
        return dict(mo_coeff=mf.mo_coeff, e_tot=np.array(mf.e_tot),
                    fock=mf.get_fock(mf.make_rdm1()),
                    eri=gto.intor_eri(mf.mol))

    d = cached("ch4-ccpvdz", build, "v1")
    mo = d["mo_coeff"][:, 1:]  # frozen core
    so = gccsd_slow.build_eris(d["eri"], mo, mo, (d["fock"], d["fock"]),
                               (4, 4))
    e, t1, t2, conv = qcisd_slow.kernel(so, conv_tol=1e-10,
                                        conv_tol_normt=1e-8)
    assert conv
    assert abs(float(d["e_tot"]) + e - E_TOT_CH4) < 1e-6
