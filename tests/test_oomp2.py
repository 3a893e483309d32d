"""OO-MP2 bath-update variants (reference umpccsd.py:76-92).

Limits: 'standard' on a canonical reference has the exact-MP2 fixed point
(t1 stays zero, all two-particle t2 couplings removed); 't2act' with an
empty active space degenerates to 'standard'; the DF-factorized and
materialized paths agree to machine precision for every variant."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import uccsd
from pyscf_mpcc_tpu.mpcc import umpccsd
from pyscf_mpcc_tpu.mpcc.oomp2 import update_amps_oomp2
from pyscf_mpcc_tpu.scf import UHF


def _o2():
    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.conv_tol_grad = 1e-9
    mf.kernel()
    return mol, mf


def test_standard_fixed_point_is_mp2():
    mol, mf = _o2()
    ue = uccsd.eris_from_scf(mf)
    emp2, _, _ = uccsd.init_amps(ue)
    conv, e, t1, t2 = umpccsd.kernel(
        ue, act_hole=([], []), act_particle=([], []), idx_s=[], idx_d=[],
        oo_mp2=True, oomp2_variant="standard",
        conv_tol=1e-11, conv_tol_normt=1e-9, max_cycle=80)
    assert conv
    assert abs(e - float(emp2)) < 1e-10
    # canonical reference: the low-level T1 residual vanishes at t1=0
    assert float(jnp.abs(t1[0]).max()) < 1e-9


def test_t2act_empty_active_is_standard():
    mol, mf = _o2()
    ue = uccsd.eris_from_scf(mf)
    c1, e1, *_ = umpccsd.kernel(
        ue, act_hole=([], []), act_particle=([], []), idx_s=[], idx_d=[],
        oo_mp2=True, oomp2_variant="standard",
        conv_tol=1e-11, conv_tol_normt=1e-9, max_cycle=80)
    c2, e2, *_ = umpccsd.kernel(
        ue, act_hole=([], []), act_particle=([], []), idx_s=[], idx_d=[],
        oo_mp2=True, oomp2_variant="t2act",
        conv_tol=1e-11, conv_tol_normt=1e-9, max_cycle=80)
    assert c1 and c2
    assert abs(e1 - e2) < 1e-12


@pytest.mark.parametrize("variant",
                         ["standard", "t2_fock", "t2_all", "t2act"])
def test_df_matches_materialized(variant):
    mol, mf = _o2()
    eri = gto.intor_eri(mol)
    nao = eri.shape[0]
    w, v = np.linalg.eigh(np.asarray(eri).reshape(nao * nao, nao * nao))
    keep = w > 1e-12
    B = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
    dm = mf.make_rdm1()
    j, k = mf.get_jk(dm)
    h = mf.get_hcore()
    fa, fb = h + j[0] + j[1] - k[0], h + j[0] + j[1] - k[1]
    na, nb = mol.nelec
    ue = uccsd.make_eris_incore(eri, mf.mo_coeff[0], mf.mo_coeff[1],
                                fa, fb, na, nb)
    ud = uccsd.make_eris_df(B, mf.mo_coeff[0], mf.mo_coeff[1],
                            fa, fb, na, nb)
    _, t1, t2 = uccsd.init_amps(ue)
    nva, nvb = t1[0].shape[1], t1[1].shape[1]
    from pyscf_mpcc_tpu.mpcc.masks import doubles_blocks
    ah, ap = ([na - 1], [nb - 1]), ([0], [0])
    act_m = (jnp.asarray(doubles_blocks(ah[0], ap[0], na, nva)[15]),
             jnp.asarray(doubles_blocks(ah[0], ap[0], na, nva,
                                        ah[1], ap[1], nb, nvb)[15]),
             jnp.asarray(doubles_blocks(ah[1], ap[1], nb, nvb)[15]))
    for _ in range(2):
        a1, a2 = update_amps_oomp2(t1, t2, ue, variant=variant,
                                   act_masks=act_m)
        b1, b2 = update_amps_oomp2(t1, t2, ud, variant=variant,
                                   act_masks=act_m, ntile=2)
        for x, y in zip((*a1, *a2), (*b1, *b2)):
            assert float(jnp.abs(x - y).max()) < 1e-12
        t1, t2 = a1, a2
