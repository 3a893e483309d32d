"""Moment-conserving GF-CCSD (cc/momgfccsd.py)."""

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc.driver import RCCSDDriver
from pyscf_mpcc_tpu.cc.momgfccsd import MomGFCCSD, build_hole_moments
from pyscf_mpcc_tpu.scf import RHF


@pytest.fixture(scope="module")
def cc():
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="sto-3g", unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    c = RCCSDDriver(mf).set(conv_tol=1e-10, conv_tol_normt=1e-8)
    c.run()
    c.solve_lambda()
    return c


def test_rdm1_from_zeroth_hole_moment(cc):
    """moment0 + h.c. must equal the Lambda-response CCSD 1-RDM
    (reference momgfccsd.make_rdm1 :767)."""
    gf = MomGFCCSD(cc)
    dm_gf = gf.make_rdm1()
    dm_ref = np.asarray(cc.make_rdm1())
    np.testing.assert_allclose(dm_gf, dm_ref, atol=1e-7)


def test_hole_poles_match_davidson_ip(cc):
    """With enough conserved moments, the lowest quasiparticle hole pole
    reproduces the Davidson IP-EOM-CCSD root."""
    e_ip = cc.ipccsd(nroots=1)[0]
    gf = MomGFCCSD(cc, niter=(4, 4))
    gf.kernel()
    ips, w = gf.ipgfccsd(nroots=3)
    assert abs(ips[0] - e_ip) < 2e-3
    assert w[0] > 0.5                      # quasiparticle-dominated


def test_particle_poles_match_davidson_ea(cc):
    e_ea = cc.eaccsd(nroots=1)[0]
    gf = MomGFCCSD(cc, niter=(4, 4))
    gf.kernel()
    eas, w = gf.eagfccsd(nroots=3)
    assert abs(eas[0] - e_ea) < 2e-3


def test_moment_conservation(cc):
    """The poles must reproduce the input moments (the defining property
    of the method)."""
    gf = MomGFCCSD(cc, niter=(2, 2))
    mom = build_hole_moments(cc.t1, cc.t2, cc.l1, cc.l2, cc.eris, 2)
    gf.kernel(hole_moments=mom)
    errs = gf.moment_errors(mom, gf.eh, gf.vh)
    assert max(errs) < 1e-6


def test_hermitian_solver_runs(cc):
    gf = MomGFCCSD(cc, niter=(1, 1))
    gf.hermi_moments = True
    gf.hermi_solver = True
    gf.kernel()
    ips, _ = gf.ipgfccsd(nroots=1)
    e_ip = cc.ipccsd(nroots=1)[0]
    assert abs(ips[0] - e_ip) < 5e-2


def test_chk_roundtrip(cc, tmp_path):
    from pyscf_mpcc_tpu.cc.momgfccsd import MomGFCCSD
    gf = MomGFCCSD(cc, niter=(1, 1))
    gf.kernel()
    p = str(tmp_path / "gf.h5")
    gf.dump_chk(p)
    gf2 = MomGFCCSD(cc, niter=(1, 1)).update_from_chk_(p)
    np.testing.assert_allclose(np.asarray(gf2.eh), np.asarray(gf.eh),
                               atol=1e-12)
    ips1, _ = gf.ipgfccsd(nroots=1)
    ips2, _ = gf2.ipgfccsd(nroots=1)
    assert abs(ips1[0] - ips2[0]) < 1e-12
