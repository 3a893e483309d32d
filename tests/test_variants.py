"""CC2 and CCD variant tests (reference cc/ccd.py + rccsd.py cc2 branch)."""

import jax.numpy as jnp

from pyscf_mpcc_tpu.cc import eris as eris_mod, rccsd
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

E_MP2 = -0.2040199672883385
E_CCSD = -0.2133432312951


def _eris():
    d = h2o_ccpvdz()
    return eris_mod.make_eris_incore(d["eri_ao"], d["mo_coeff"],
                                     d["fock_ao"], 5)


def test_ccd_converges_t1_zero():
    er = _eris()
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100, variant="ccd")
    assert conv
    assert float(jnp.abs(t1).max()) == 0.0
    # CCD is close to but distinct from CCSD
    assert abs(e - E_CCSD) < 5e-3
    assert abs(e - E_CCSD) > 1e-6


def test_cc2_between_mp2_and_ccsd():
    er = _eris()
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-10, conv_tol_normt=1e-8,
                                   max_cycle=100, variant="cc2")
    assert conv
    # CC2 corrects MP2 modestly; for canonical HF water it stays within a
    # few mHa of MP2 and well above the CCSD correlation energy in error
    assert abs(e - E_MP2) < 5e-3
    assert abs(e - E_MP2) > 1e-7


def test_cc2_with_zero_t1_is_mp2():
    """At t1 = 0 the CC2 doubles equation is exactly MP2."""
    er = _eris()
    emp2, t1, t2 = rccsd.init_amps(er)
    t1 = jnp.zeros_like(t1)
    t1n, t2n = rccsd.update_amps(t1, t2, er, variant="cc2")
    # doubles unchanged from the MP2 guess
    assert float(jnp.abs(t2n - t2).max()) < 1e-12
