"""Unrestricted Lambda: validated by the defining property of the CC
Lagrangian — its derivative w.r.t. a Fock perturbation at fixed (t, lambda)
equals the derivative of the fully re-solved CC energy."""

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.cc import lambda_ad, uccsd
from pyscf_mpcc_tpu.scf import RHF


def test_ulambda_lagrangian_derivative():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    eri = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    ue = uccsd.make_eris_incore(eri, mf.mo_coeff, mf.mo_coeff, f, f, 5, 5)
    conv, e0, t1u, t2u = uccsd.kernel(ue, conv_tol=1e-12,
                                      conv_tol_normt=1e-10, max_cycle=150)
    assert conv
    convl, l1u, l2u = lambda_ad.kernel_u(t1u, t2u, ue, conv_tol=1e-9,
                                         max_cycle=80)
    assert convl

    rng = np.random.RandomState(5)
    V = rng.randn(7, 7) * 0.01
    V = 0.5 * (V + V.T)
    Vj = jnp.asarray(V)

    def eris_eps(eps):
        return ue._replace(focka=ue.focka + eps * Vj,
                           fockb=ue.fockb + eps * Vj)

    def lagr(eps):
        er = eris_eps(eps)
        e = uccsd.energy(t1u, t2u, er)
        r1, r2 = lambda_ad.residual_u(t1u, t2u, er)
        return e + sum(jnp.vdot(l, r)
                       for l, r in zip((*l1u, *l2u), (*r1, *r2)))

    dpred = float(jax.grad(lagr)(0.0))

    def esolve(eps):
        conv_, e, *_ = uccsd.kernel(eris_eps(eps), conv_tol=1e-12,
                                    conv_tol_normt=1e-10, max_cycle=150,
                                    t1=t1u, t2=t2u)
        assert conv_
        return e

    h = 2e-4
    dfd = (esolve(h) - esolve(-h)) / (2 * h)
    assert abs(dpred - dfd) < 1e-8


def test_ulambda_device_diis_matches_host():
    """kernel_u with the on-device ring (host-solve hybrid) reaches the
    same multipliers as the host ring."""
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.kernel()
    eri = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    ue = uccsd.make_eris_incore(eri, mf.mo_coeff, mf.mo_coeff, f, f, 5, 5)
    conv, _, t1u, t2u = uccsd.kernel(ue, conv_tol=1e-12,
                                     conv_tol_normt=1e-10, max_cycle=150)
    assert conv
    ch, l1h, l2h = lambda_ad.kernel_u(t1u, t2u, ue, conv_tol=1e-9,
                                      max_cycle=80)
    cd, l1d, l2d = lambda_ad.kernel_u(t1u, t2u, ue, conv_tol=1e-9,
                                      max_cycle=80, diis_backend="device")
    assert ch and cd
    for a, b in zip((*l1h, *l2h), (*l1d, *l2d)):
        assert float(jnp.abs(a - b).max()) < 1e-8


def test_masked_lambda_frozen_convention_r_vs_u():
    """Frozen lambda blocks hold their incoming (t) values in BOTH the
    restricted and unrestricted solvers (the reference umpccsd_lambda
    convention).  NB the relaxed multipliers themselves are NOT comparable
    across the two solvers: lambda are duals of the chosen residual
    parameterization, and the unrestricted problem carries independent
    aa/bb constraints the restricted spin-adapted parameterization folds
    into the ab channel — only the convention and derived observables
    coincide."""
    from pyscf_mpcc_tpu.cc import rccsd
    from pyscf_mpcc_tpu.cc.eris import make_eris_incore
    from pyscf_mpcc_tpu.mpcc.masks import frozen_masks
    from pyscf_mpcc_tpu.mpcc.umpccsd import frozen_masks_u

    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.conv_tol_grad = 1e-10
    mf.kernel()
    eri = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    nocc = 5
    er = make_eris_incore(eri, mf.mo_coeff, f, nocc)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-12, conv_tol_normt=1e-10,
                                   max_cycle=150)
    assert conv
    nvir = t1.shape[1]

    act_hole = [3, 4]
    act_particle = [0, 1]
    # freeze everything EXCEPT the all-active blocks (3 for singles, 15 for
    # doubles) so a nontrivial region actually relaxes (sto-3g has nvir=2,
    # so act_particle covers all virtuals and most blocks are empty)
    idx_s, idx_d = [0, 1, 2], list(range(15))
    m1, m2 = frozen_masks(act_hole, act_particle, nocc, nvir, idx_s, idx_d)
    convl, l1, l2 = lambda_ad.kernel(t1, t2, er, conv_tol=1e-10,
                                     max_cycle=80, m1=m1, m2=m2)
    assert convl
    # frozen blocks keep the t values they were initialized to...
    assert float(jnp.abs(jnp.where(m1, l1 - t1, 0.0)).max()) < 1e-12
    assert float(jnp.abs(jnp.where(m2, l2 - t2, 0.0)).max()) < 1e-12
    # ...while the relaxed (all-active) block genuinely moves
    assert float(jnp.abs(jnp.where(m2, 0.0, l2 - t2)).max()) > 1e-4

    # unrestricted solve with the equivalent masks on the same system
    ue = uccsd.make_eris_incore(eri, mf.mo_coeff, mf.mo_coeff, f, f,
                                nocc, nocc)
    t1u = (t1, t1)
    t2ab = t2
    t2aa = t2 - t2.transpose(0, 1, 3, 2)
    t2u = (t2aa, t2ab, t2aa)
    masks_u = frozen_masks_u((act_hole, act_hole),
                             (act_particle, act_particle),
                             (nocc, nocc), (nvir, nvir),
                             (idx_s, idx_s), (idx_d, idx_d, idx_d))
    convu, l1u, l2u = lambda_ad.kernel_u(t1u, t2u, ue, conv_tol=1e-9,
                                         max_cycle=120, masks=masks_u)
    assert convu
    # same convention in the unrestricted solver: frozen blocks hold t
    assert float(jnp.abs(jnp.where(masks_u[0], l1u[0] - t1, 0.0)).max()) < 1e-12
    assert float(jnp.abs(jnp.where(masks_u[3], l2u[1] - t2, 0.0)).max()) < 1e-12
    # spin symmetry of the unrestricted solution is preserved by the freeze
    assert float(jnp.abs(l1u[0] - l1u[1]).max()) < 1e-9
    assert float(jnp.abs(l2u[0] - l2u[2]).max()) < 1e-9


def test_masked_lambda_empty_mask_matches_unmasked():
    """All-False masks must reproduce the unmasked Lambda solution."""
    from pyscf_mpcc_tpu.cc import rccsd
    from pyscf_mpcc_tpu.cc.eris import make_eris_incore

    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    mf = RHF(mol)
    mf.conv_tol = 1e-13
    mf.kernel()
    eri = gto.intor_eri(mol)
    f = mf.get_fock(mf.make_rdm1())
    er = make_eris_incore(eri, mf.mo_coeff, f, 5)
    conv, e, t1, t2 = rccsd.kernel(er, conv_tol=1e-12, conv_tol_normt=1e-10,
                                   max_cycle=150)
    assert conv
    c0, l1_0, l2_0 = lambda_ad.kernel(t1, t2, er, conv_tol=1e-11,
                                      max_cycle=80)
    m1 = jnp.zeros(t1.shape, bool)
    m2 = jnp.zeros(t2.shape, bool)
    c1, l1_m, l2_m = lambda_ad.kernel(t1, t2, er, conv_tol=1e-11,
                                      max_cycle=80, m1=m1, m2=m2)
    assert c0 and c1
    assert float(jnp.abs(l1_m - l1_0).max()) < 1e-9
    assert float(jnp.abs(l2_m - l2_0).max()) < 1e-9


def test_uccsd_rdm_energy_identity_o2():
    """UCCSD response densities: the integral-contraction of
    (dm1, dm2) must reproduce E_HF_elec + E_UCCSD exactly, and the
    spin traces must equal (na, nb)."""
    import numpy as np
    import jax.numpy as jnp
    from pyscf_mpcc_tpu import ao2mo, gto
    from pyscf_mpcc_tpu.cc import lambda_ad, uccsd
    from pyscf_mpcc_tpu.scf import UHF

    mol = gto.M(atom="O 0 0 0; O 0 0 1.21", basis="sto-3g",
                unit="angstrom", spin=2)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    na, nb = mol.nelec
    eri_ao = gto.intor_eri(mol)
    dm = mf.make_rdm1()
    j, k = mf.get_jk(dm)
    h = mf.get_hcore()
    fa = h + j[0] + j[1] - k[0]
    fb = h + j[0] + j[1] - k[1]
    er = uccsd.make_eris_incore(eri_ao, mf.mo_coeff[0], mf.mo_coeff[1],
                                fa, fb, na, nb)
    conv, e_corr, t1, t2 = uccsd.kernel(er, conv_tol=1e-10,
                                        conv_tol_normt=1e-8)
    assert conv
    cl, l1, l2 = lambda_ad.kernel_u(t1, t2, er, conv_tol=1e-8)
    assert cl

    moa, mob = np.asarray(mf.mo_coeff[0]), np.asarray(mf.mo_coeff[1])
    h_a = jnp.asarray(moa.T @ h @ moa)
    h_b = jnp.asarray(mob.T @ h @ mob)
    eri = jnp.asarray(eri_ao)
    g_aa = ao2mo.full(eri, jnp.asarray(moa))
    g_bb = ao2mo.full(eri, jnp.asarray(mob))
    g_ab = ao2mo.general(eri, (moa, moa, mob, mob))
    (d1a, d1b), (d2aa, d2ab, d2bb) = lambda_ad.make_rdm12_u(
        h_a, h_b, g_aa, g_ab, g_bb, t1, t2, l1, l2, na, nb)
    assert abs(float(jnp.trace(d1a)) - na) < 1e-8
    assert abs(float(jnp.trace(d1b)) - nb) < 1e-8
    e_rdm = float(jnp.sum(d1a * h_a) + jnp.sum(d1b * h_b)
                  + 0.5 * jnp.einsum("pqrs,pqrs->", g_aa, d2aa)
                  + 0.5 * jnp.einsum("pqrs,pqrs->", g_bb, d2bb)
                  + jnp.einsum("pqrs,pqrs->", g_ab, d2ab))
    e_hf_elec = mf.e_tot - mol.energy_nuc()
    assert abs(e_rdm - (e_hf_elec + float(e_corr))) < 1e-8


def test_u_lagrangian_df_factorized_stationary():
    """lagrangian_energy_u (DF-factorized, used by the open-shell fp64
    certification stage) is exact at the fixed point and quadratic in
    amplitude perturbations — the stationarity property the
    openshell_certify protocol rests on."""
    from pyscf_mpcc_tpu.scf import UHF

    mol = gto.M(atom="O 0 0 0; H 0 0 0.97", basis="cc-pvdz", spin=1)
    mf = UHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    er = uccsd.eris_from_scf(mf)
    conv, e_corr, t1, t2 = uccsd.kernel(er, conv_tol=1e-11,
                                        conv_tol_normt=1e-9,
                                        max_cycle=200)
    assert conv
    cl, l1, l2 = lambda_ad.kernel_u(t1, t2, er, conv_tol=1e-9,
                                    max_cycle=100)
    assert cl
    el = float(lambda_ad.lagrangian_energy_u(t1, t2, l1, l2, er))
    assert abs(el - float(e_corr)) < 1e-9

    rng = np.random.default_rng(0)
    t1p = tuple(a + jnp.asarray(rng.standard_normal(a.shape)) * 1e-4
                for a in t1)
    el_p = float(lambda_ad.lagrangian_energy_u(t1p, t2, l1, l2, er))
    assert abs(el_p - float(e_corr)) < 1e-7   # O(|dt|^2) ~ 1e-8
