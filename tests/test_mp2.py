import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu import ao2mo
from pyscf_mpcc_tpu.mp import mp2
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

# pyscf/cc/test/test_h2o.py:60
E_MP2 = -0.2040199672883385


def _ovov(d):
    nocc = 5
    co = d["mo_coeff"][:, :nocc]
    cv = d["mo_coeff"][:, nocc:]
    return ao2mo.general(jnp.asarray(d["eri_ao"]), (co, cv, co, cv))


def test_canonical_mp2():
    d = h2o_ccpvdz()
    ovov = _ovov(d)
    e, t2 = mp2.kernel(jnp.asarray(d["mo_energy"][:5]),
                       jnp.asarray(d["mo_energy"][5:]), ovov)
    assert abs(float(e) - E_MP2) < 1e-10


def test_ss_os_split_sums_to_total():
    d = h2o_ccpvdz()
    ovov = _ovov(d)
    e, _ = mp2.kernel(jnp.asarray(d["mo_energy"][:5]),
                      jnp.asarray(d["mo_energy"][5:]), ovov)
    ess, eos = mp2.kernel_ss_os(jnp.asarray(d["mo_energy"][:5]),
                                jnp.asarray(d["mo_energy"][5:]), ovov)
    assert abs(float(ess) + float(eos) - float(e)) < 1e-12


def test_iterative_mp2_matches_canonical():
    """Non-canonical solver on a canonical Fock must hit the canonical value."""
    d = h2o_ccpvdz()
    ovov = _ovov(d)
    nocc = 5
    mo = d["mo_coeff"]
    fock_mo = mo.T @ d["fock_ao"] @ mo
    e, t2, conv = mp2.iterative_kernel(
        ovov, jnp.asarray(fock_mo[:nocc, :nocc]),
        jnp.asarray(fock_mo[nocc:, nocc:]), conv_tol=1e-12)
    assert conv
    assert abs(e - E_MP2) < 1e-8


def test_iterative_mp2_noncanonical_invariance():
    """Rotate the occupied orbitals (localized-orbital surrogate): the
    iterative solver must reproduce the same correlation energy."""
    d = h2o_ccpvdz()
    nocc = 5
    mo = d["mo_coeff"].copy()
    rng = np.random.RandomState(7)
    # rotate the valence occupied block only (localization never mixes the
    # deep core into valence; a core-valence rotation makes plain Jacobi
    # nearly non-convergent for any implementation)
    q, _ = np.linalg.qr(rng.randn(nocc - 1, nocc - 1))
    mo[:, 1:nocc] = mo[:, 1:nocc] @ q
    co, cv = mo[:, :nocc], mo[:, nocc:]
    ovov = ao2mo.general(jnp.asarray(d["eri_ao"]), (co, cv, co, cv))
    fock_mo = mo.T @ d["fock_ao"] @ mo
    e, t2, conv = mp2.iterative_kernel(
        ovov, jnp.asarray(fock_mo[:nocc, :nocc]),
        jnp.asarray(fock_mo[nocc:, nocc:]), conv_tol=1e-11, max_cycle=200)
    assert conv
    assert abs(e - E_MP2) < 1e-8


def test_etb_auxbasis_dfmp2():
    """Auto-generated even-tempered aux basis gives typical DF accuracy."""
    from pyscf_mpcc_tpu.df import DF
    from pyscf_mpcc_tpu.testutil import mol_of
    d = h2o_ccpvdz()
    mol = mol_of()
    df = DF(mol, "etb")
    df.build()
    co = d["mo_coeff"][:, :5]
    cv = d["mo_coeff"][:, 5:]
    Lov = np.einsum("Lpq,pi,qa->Lia", df.B_ao(), co, cv, optimize=True)
    e, _ = mp2.df_kernel(jnp.asarray(d["mo_energy"][:5]),
                         jnp.asarray(d["mo_energy"][5:]), jnp.asarray(Lov))
    assert abs(float(e) - E_MP2) < 1e-4


def test_df_ump2_matches_incore_on_rhf_reference():
    """DF-UMP2 with exact-Cholesky factors == canonical spin-summed MP2."""
    import numpy as np
    import scipy.linalg
    import jax.numpy as jnp_
    from pyscf_mpcc_tpu.mp import ump2
    d = h2o_ccpvdz()
    nocc = 5
    # exact Cholesky "DF": B[L,p,q] from the full ERI tensor
    nao = d["mo_coeff"].shape[0]
    eri = np.asarray(d["eri_ao"]).reshape(nao * nao, nao * nao)
    w, v = np.linalg.eigh(eri)
    keep = w > 1e-12
    B = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
    co = d["mo_coeff"][:, :nocc]
    cv = d["mo_coeff"][:, nocc:]
    Lov = jnp_.einsum("Lpq,pi,qa->Lia", jnp_.asarray(B),
                      jnp_.asarray(co), jnp_.asarray(cv))
    eo = jnp_.asarray(d["mo_energy"][:nocc])
    ev = jnp_.asarray(d["mo_energy"][nocc:])
    e_u, (eaa, eab, ebb) = ump2.df_kernel(((eo, ev), (eo, ev)), Lov, Lov)
    assert abs(e_u - E_MP2) < 1e-9
    assert abs(eaa - ebb) < 1e-12
