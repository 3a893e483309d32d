"""Pin reference (PySCF fork) numbers for parity tests, running the
reference's own cc/mp Python code on integrals injected from our
engine (see tools/oracle.py; build with tools/build_reference_oracle.sh).

Run:  PYTHONPATH=.scratch/oracle python tools/pin_reference_values.py [which]
Emits 'PIN <key> <json>' lines; values are transcribed into tests/ and
docs/PARITY.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tools.oracle as oracle  # noqa: E402

BENZENE = """
C    0.000000    1.392000    0.000000
C    1.205508    0.696000    0.000000
C    1.205508   -0.696000    0.000000
C    0.000000   -1.392000    0.000000
C   -1.205508   -0.696000    0.000000
C   -1.205508    0.696000    0.000000
H    0.000000    2.478000    0.000000
H    2.146012    1.239000    0.000000
H    2.146012   -1.239000    0.000000
H    0.000000   -2.478000    0.000000
H   -2.146012   -1.239000    0.000000
H   -2.146012    1.239000    0.000000
"""

H2O = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"

HARTREE2EV = 27.211386245988


def pin(key, **kw):
    print("PIN %s %s" % (key, json.dumps(kw)), flush=True)


def benzene_eom():
    """EOM-EE/IP/EA-CCSD benzene/cc-pVDZ: the production-parity anchor
    (reference eom_rccsd.py:977 eeccsd; :291 ipccsd; :606 eaccsd)."""
    t0 = time.time()
    mf = oracle.reference_mf(BENZENE, "cc-pvdz", conv_tol=1e-11, verbose=4)
    pin("benzene_ccpvdz_rhf", e_tot=mf.e_tot, sec=round(time.time() - t0, 1))

    from pyscf import cc as refcc
    mycc = refcc.CCSD(mf)
    mycc.conv_tol = 1e-8
    mycc.max_cycle = 100
    t0 = time.time()
    mycc.kernel()
    assert mycc.converged
    pin("benzene_ccpvdz_ccsd", e_corr=mycc.e_corr,
        sec=round(time.time() - t0, 1))

    t0 = time.time()
    ee = mycc.eomee_ccsd_singlet(nroots=4)[0]
    pin("benzene_ccpvdz_eomee_singlet",
        roots_ev=[float(e) * HARTREE2EV for e in np.atleast_1d(ee)],
        sec=round(time.time() - t0, 1))

    t0 = time.time()
    ip = mycc.ipccsd(nroots=3)[0]
    ea = mycc.eaccsd(nroots=3)[0]
    pin("benzene_ccpvdz_eomip", roots_ev=[float(e) * HARTREE2EV
                                          for e in np.atleast_1d(ip)])
    pin("benzene_ccpvdz_eomea", roots_ev=[float(e) * HARTREE2EV
                                          for e in np.atleast_1d(ea)],
        sec=round(time.time() - t0, 1))


def h2o_eom_ip_ea():
    """Small-molecule reference-pinned IP/EA (for tests/test_eom_ip_ea.py)."""
    mf = oracle.reference_mf(H2O, "cc-pvdz", conv_tol=1e-12)
    from pyscf import cc as refcc
    mycc = refcc.CCSD(mf)
    mycc.conv_tol = 1e-10
    mycc.kernel()
    assert mycc.converged
    pin("h2o_ccpvdz_ccsd", e_corr=mycc.e_corr)
    ip = mycc.ipccsd(nroots=3)[0]
    ea = mycc.eaccsd(nroots=3)[0]
    ee = mycc.eomee_ccsd_singlet(nroots=3)[0]
    pin("h2o_ccpvdz_eom",
        ip=[float(e) for e in np.atleast_1d(ip)],
        ea=[float(e) for e in np.atleast_1d(ea)],
        ee_singlet=[float(e) for e in np.atleast_1d(ee)])


def dfgmp2():
    """Reference DF-GMP2 (mp/dfgmp2.py) on a GHF reference whose _cderi
    is injected from our DF engine -> bit-identical factors."""
    import sys as _sys
    _sys.path.insert(0, oracle._REPO)
    from pyscf_mpcc_tpu import gto as mygto
    from pyscf_mpcc_tpu.df import df as mydf

    for basis in ("sto-3g", "631g"):
        mf = oracle.reference_mf(H2O, basis, kind="GHF", conv_tol=1e-12)
        mymol = mygto.M(atom=H2O, basis=basis, unit="angstrom")
        B = np.asarray(mydf.DF(mymol).B_ao())           # (naux, nao, nao)
        naux, nao = B.shape[0], B.shape[1]
        tril = np.tril_indices(nao)
        mfdf = mf.density_fit()
        mfdf.with_df._cderi = np.ascontiguousarray(B[:, tril[0], tril[1]])
        mfdf.mo_coeff = mf.mo_coeff
        mfdf.mo_energy = mf.mo_energy
        mfdf.mo_occ = mf.mo_occ
        mfdf.converged = True
        from pyscf.mp import dfgmp2 as ref_dfgmp2
        pt = ref_dfgmp2.DFGMP2(mfdf)
        e = pt.kernel()[0]
        pin("h2o_%s_dfgmp2" % basis, e_corr=float(e),
            e_scf=float(mf.e_tot), naux=int(naux))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "dfgmp2"):
        dfgmp2()
    if which in ("all", "h2o"):
        h2o_eom_ip_ea()
    if which in ("all", "benzene"):
        benzene_eom()
