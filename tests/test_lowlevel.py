import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.mpcc import lowlevel
from pyscf_mpcc_tpu.testutil import h2o_ccpvdz

E_MP2 = -0.2040199672883385
# regression anchor computed with this framework (exact-Cholesky factors,
# H2O/cc-pVDZ): dressed screened-CC2 low-level energy
E_LL = -0.20549941032564464


def _factors():
    d = h2o_ccpvdz()
    nocc, nao = 5, d["eri_ao"].shape[0]
    w, v = np.linalg.eigh(d["eri_ao"].reshape(nao * nao, nao * nao))
    keep = w > 1e-12
    B = (v[:, keep] * np.sqrt(w[keep])).T.reshape(-1, nao, nao)
    mo = d["mo_coeff"]
    L = np.einsum("Lpq,pi,qj->Lij", B, mo, mo, optimize=True)
    fock_mo = mo.T @ d["fock_ao"] @ mo
    return (jnp.asarray(L[:, :nocc, :nocc]), jnp.asarray(L[:, :nocc, nocc:]),
            jnp.asarray(L[:, nocc:, nocc:]), fock_mo, nocc)


def test_zeroth_iteration_is_mp2():
    Loo, Lov, Lvv, fock_mo, nocc = _factors()
    nvir = Lvv.shape[1]
    eo = np.diag(fock_mo)[:nocc]
    ev = np.diag(fock_mo)[nocc:]
    eia = jnp.asarray(ev[None, :] - eo[:, None])
    t1z = jnp.zeros((nocc, nvir))
    _, t2, de, _ = lowlevel.update_amps(
        t1z, Loo, Lov, Lvv, jnp.zeros((nocc, nocc)),
        jnp.zeros((nvir, nvir)), eia)
    assert abs(float(de) - E_MP2) < 1e-10


def test_converged_low_level_energy():
    Loo, Lov, Lvv, fock_mo, nocc = _factors()
    conv, e, t1, t2 = lowlevel.kernel(Loo, Lov, Lvv, fock_mo, nocc,
                                      conv_tol=1e-9)
    assert conv
    assert abs(e - E_LL) < 1e-8
    # t1-dressing lowers the energy relative to bare MP2
    assert e < E_MP2
