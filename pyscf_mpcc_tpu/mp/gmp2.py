"""Generalized (spin-orbital) MP2.

Role of the reference's mp/gmp2.py: MP2 over spin-orbital integrals,
uniform for RHF/UHF/ROHF references via the gccsd_slow eris builder."""

from __future__ import annotations

def kernel(eris):
    """(e_mp2, t2_so) from a cc.gccsd_slow.SpinOrbERIs container."""
    from pyscf_mpcc_tpu.cc import gccsd_slow
    emp2, t1, t2 = gccsd_slow.init_amps(eris)
    return float(emp2), t2


def kernel_from_scf(mf):
    from pyscf_mpcc_tpu.cc import gccsd_slow
    return kernel(gccsd_slow.eris_from_scf(mf))
