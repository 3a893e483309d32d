"""AutoAux auxiliary basis generation (Stoychev JCTC 13, 554)."""

import numpy as np

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.df.autoaux import _auto_aux_element, autoaux
from pyscf_mpcc_tpu.scf import RHF


def test_autoaux_covers_product_space():
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="cc-pvdz", unit="angstrom")
    aux = autoaux(mol)
    # O (l_max=2, l_val=1) must reach l=3 = min(max(2, 2+1), 4)
    assert max(l for l, _ in aux["O"]) == 3
    # H (l_max=1, l_val=0) reaches l=2 = min(max(0, 1+1), 2)
    assert max(l for l, _ in aux["H"]) == 2
    # even-tempered: consecutive same-l exponents differ by a constant beta
    es = [e for l, (e, _) in aux["O"] if l == 0]
    ratios = np.array(es[:-1]) / np.array(es[1:])
    assert np.allclose(ratios, ratios[0], rtol=1e-10) or np.allclose(
        1 / ratios, 1 / ratios[0], rtol=1e-10)


def test_autoaux_df_scf_accuracy():
    """DF-SCF with AutoAux must track the exact SCF to ~1e-5 Ha (far
    tighter than a J-only fitting set)."""
    mol = gto.M(atom="O 0 0 0.1173; H 0 0.7572 -0.4692; "
                     "H 0 -0.7572 -0.4692",
                basis="cc-pvdz", unit="angstrom")
    mf0 = RHF(mol)
    mf0.conv_tol = 1e-11
    mf0.kernel()
    mf1 = RHF(mol).density_fit(auxbasis="autoaux")
    mf1.conv_tol = 1e-11
    mf1.kernel()
    assert abs(mf1.e_tot - mf0.e_tot) < 1e-5


def test_autoaux_primitive_effective_exponent():
    """For a single uncontracted primitive, the effective exponent must
    reduce to the exponent itself (the corrected eq 9)."""
    mol = gto.M(atom="H 0 0 0; H 0 0 0.74",
                basis={"H": [[0, [1.3, 1.0]]]}, unit="angstrom", spin=0)
    sh = [s for s in mol.shells if s.atom_id == 0]
    from pyscf_mpcc_tpu.df.autoaux import _ranges_by_l
    emax, emin, eeff = _ranges_by_l(sh)
    assert abs(eeff[0] - 1.3) < 1e-6
