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


def test_qcisd_t_consistency():
    """QCISD(T): the spin-orbital (T) with the doubled disconnected-V
    (reference QCIsd_t_contract fac=2.0) must agree with the independent
    restricted dense functional evaluated with v_fac=2 on the same
    (spin-summed) amplitudes; and for a 2-electron system the triples
    correction must vanish identically."""
    import numpy as np
    import jax.numpy as jnp
    from pyscf_mpcc_tpu.cc import (ccsd_t_rdm, gccsd_slow, gccsd_t_slow,
                                   qcisd_slow, rccsd)
    from pyscf_mpcc_tpu.cc import eris as eris_mod
    from pyscf_mpcc_tpu.testutil import h2o_ccpvdz
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.scf import RHF

    # 2-electron system: no triples -> E_T(QCISD) == 0
    mol = gto.M(atom="H 0 0 0; H 0 0 0.74", basis="cc-pvdz",
                unit="angstrom")
    mf = RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    er_so = gccsd_slow.eris_from_scf(mf)
    e_q, e_t = qcisd_slow.kernel_t(er_so, conv_tol=1e-11)
    assert abs(e_t) < 1e-12

    # v_fac=2 cross-check between the two independent (T) codes on
    # common (RCCSD) amplitudes
    d = h2o_ccpvdz()
    er = eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                   d["fock_ao"], 5)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-11, conv_tol_normt=1e-9)
    e_r = float(ccsd_t_rdm.e_t_dense(t1, t2, er, v_fac=2.0))

    so = gccsd_slow.build_eris(d["eri_ao"], d["mo_coeff"], d["mo_coeff"],
                               (d["fock_ao"], d["fock_ao"]), (5, 5))
    from pyscf_mpcc_tpu.cc import addons
    no, nv = t1.shape
    t1g = addons.spatial2spin_t1(t1)
    t2g = addons.spatial2spin_t2(t2)
    np.testing.assert_allclose(addons.spin2spatial_t2(t2g, no, nv),
                               np.asarray(t2), atol=1e-14)
    e_g = float(gccsd_t_slow.kernel(jnp.asarray(t1g), jnp.asarray(t2g),
                                    so, v_fac=2.0))
    assert abs(e_g - e_r) < 1e-9


def test_qcisd_device_engine_matches_slow():
    """Device spin-orbital QCISD (gccsd variant='qcisd') vs the NumPy
    oracle on the same molecule (different spinor orderings — the energy
    is invariant)."""
    from pyscf_mpcc_tpu.cc import gccsd, qcisd
    from pyscf_mpcc_tpu.testutil import h2o_ccpvdz
    from types import SimpleNamespace

    d = h2o_ccpvdz()
    mol = gto.M(atom=[[8, (0., 0., 0.)], [1, (0., -0.757, 0.587)],
                      [1, (0., 0.757, 0.587)]], basis="cc-pvdz")
    mf = SimpleNamespace(
        mol=mol, mo_coeff=d["mo_coeff"],
        get_fock=lambda *a: d["fock_ao"],
        make_rdm1=lambda *a: None, e_tot=float(d["e_tot"]))
    er_so = gccsd_slow.build_eris(d["eri_ao"], d["mo_coeff"],
                                  d["mo_coeff"],
                                  (d["fock_ao"], d["fock_ao"]), (5, 5))
    e_slow, _, _, conv_s = qcisd_slow.kernel(er_so, conv_tol=1e-10,
                                             conv_tol_normt=1e-8)
    assert conv_s
    q = qcisd.QCISD(mf).run()
    assert q.converged
    np.testing.assert_allclose(q.e_corr, e_slow, rtol=0, atol=1e-9)


def test_qcisd_t_device_matches_slow():
    """QCISD(T) through the PRODUCTION restricted tile engine (vfac=2 on
    the mapped closed-shell amplitudes) vs the spin-orbital slow tier."""
    from pyscf_mpcc_tpu.cc import gccsd_t_slow, qcisd
    from pyscf_mpcc_tpu.testutil import h2o_ccpvdz
    from types import SimpleNamespace

    d = h2o_ccpvdz()
    mol = gto.M(atom=[[8, (0., 0., 0.)], [1, (0., -0.757, 0.587)],
                      [1, (0., 0.757, 0.587)]], basis="cc-pvdz")
    mf = SimpleNamespace(
        mol=mol, mo_coeff=d["mo_coeff"],
        get_fock=lambda *a: d["fock_ao"],
        make_rdm1=lambda *a: None, e_tot=float(d["e_tot"]))
    q = qcisd.QCISD(mf).run()
    assert q.converged
    et_dev = q.ccsd_t(tile=5)
    # oracle: spin-orbital (T) with v_fac=2 on the SAME amplitudes
    et_slow = float(gccsd_t_slow.kernel(np.asarray(q.t1),
                                        np.asarray(q.t2), q._geris,
                                        v_fac=2.0))
    np.testing.assert_allclose(et_dev, et_slow, rtol=0, atol=1e-10)
    assert abs(et_dev) > 1e-6  # non-trivial correction
