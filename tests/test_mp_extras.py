"""UMP2, SCS, MP2 densities / FNO, and checkpointing."""

import os

import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu import ao2mo, gto
from pyscf_mpcc_tpu.cc import gccsd_slow, uccsd
from pyscf_mpcc_tpu.lib import chkfile
from pyscf_mpcc_tpu.mp import mp2, ump2
from pyscf_mpcc_tpu.scf import RHF, UHF
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

E_MP2 = -0.2040199672883385


def test_ump2_closed_shell_matches_rmp2():
    d = h2o_ccpvdz()
    # build UERIs with identical spins from cached AO data
    from pyscf_mpcc_tpu.testutil import mol_of
    er = uccsd.make_eris_incore(d["eri_ao"], d["mo_coeff"], d["mo_coeff"],
                                d["fock_ao"], d["fock_ao"], 5, 5)
    e, t2 = ump2.kernel_from_ueris(er)
    assert abs(e - E_MP2) < 1e-9


def test_ump2_iterative_matches_canonical():
    d = h2o_ccpvdz()
    er = uccsd.make_eris_incore(d["eri_ao"], d["mo_coeff"], d["mo_coeff"],
                                d["fock_ao"], d["fock_ao"], 5, 5)
    e, t2, conv = ump2.iterative_kernel(er, conv_tol=1e-11)
    assert conv
    assert abs(e - E_MP2) < 1e-8


def test_scs_components():
    d = h2o_ccpvdz()
    er = uccsd.make_eris_incore(d["eri_ao"], d["mo_coeff"], d["mo_coeff"],
                                d["fock_ao"], d["fock_ao"], 5, 5)
    e_scs, e_ss, e_os = ump2.scs_energy(er)
    assert abs((e_ss + e_os) - E_MP2) < 1e-9


def test_mp2_rdm_vs_spin_orbital():
    from pyscf_mpcc_tpu import gto as _gto
    mol = _gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                       [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    so = gccsd_slow.eris_from_scf(mf)
    _, _, t2so = gccsd_slow.init_amps(so)
    Pso = 0.5 * np.einsum("ijac,ijbc->ab", t2so, t2so)
    eri = gto.intor_eri(mol)
    co, cv = mf.mo_coeff[:, :5], mf.mo_coeff[:, 5:]
    ovov = ao2mo.general(jnp.asarray(eri), (co, cv, co, cv))
    _, t2 = mp2.kernel(jnp.asarray(mf.mo_energy[:5]),
                       jnp.asarray(mf.mo_energy[5:]), ovov)
    nva = cv.shape[1]
    assert abs(2 * Pso[:nva, :nva] - np.asarray(mp2.make_rdm1_vv(t2))).max() < 1e-12
    dm = np.asarray(mp2.make_rdm1(t2, 5))
    assert abs(np.trace(dm) - 10.0) < 1e-10


def test_fno_keeps_energy_when_untruncated():
    d = h2o_ccpvdz()
    co = d["mo_coeff"][:, :5]
    cv = d["mo_coeff"][:, 5:]
    ovov = ao2mo.general(jnp.asarray(d["eri_ao"]), (co, cv, co, cv))
    _, t2 = mp2.kernel(jnp.asarray(d["mo_energy"][:5]),
                       jnp.asarray(d["mo_energy"][5:]), ovov)
    mo_no, n_keep, w = mp2.make_fno(t2, d["mo_energy"], d["mo_coeff"], 5,
                                    thresh=-1.0)
    assert n_keep == cv.shape[1]
    # rotation is unitary in the virtual block (metric = AO overlap)
    S = np.asarray(d["ovlp"]) if "ovlp" in d else None
    if S is not None:
        ov = mo_no[:, 5:].T @ S @ mo_no[:, 5:]
        assert abs(ov - np.eye(ov.shape[0])).max() < 1e-8
    assert (w >= -1e-10).all()


def test_chkfile_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "cc.chk")
    t1 = np.random.rand(3, 4)
    t2 = np.random.rand(3, 3, 4, 4)
    chkfile.dump_cc(p, -0.123, t1, t2)
    data = chkfile.load_cc(p)
    assert abs(float(data["e_corr"]) - -0.123) < 1e-15
    assert np.abs(data["t1"] - t1).max() == 0
    assert np.abs(data["t2"] - t2).max() == 0
