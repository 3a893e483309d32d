import math

import numpy as np
import pytest

from pyscf_mpcc_tpu import gto
from pyscf_mpcc_tpu.gto.mole import _real_solid_harmonics, cart2sph


def _angular_integral(m1, m2):
    a, b, c = (x + y for x, y in zip(m1, m2))
    if a % 2 or b % 2 or c % 2:
        return 0.0
    def dfact(n):
        r = 1
        while n > 1:
            r *= n
            n -= 2
        return r
    return 4 * math.pi * dfact(a - 1) * dfact(b - 1) * dfact(c - 1) / dfact(a + b + c + 1)


def test_solid_harmonics_orthonormal():
    tab = _real_solid_harmonics(6)
    for l in range(7):
        for m1 in range(2 * l + 1):
            for m2 in range(2 * l + 1):
                v = sum(c1 * c2 * _angular_integral(mo1, mo2)
                        for mo1, c1 in tab[l][m1].items()
                        for mo2, c2 in tab[l][m2].items())
                expect = 4 * math.pi / (2 * l + 1) if m1 == m2 else 0.0
                assert abs(v - expect) < 1e-10 * max(1.0, abs(expect))


def test_overlap_normalized():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="cc-pvdz")
    assert mol.nao == 24
    S = gto.intor_ovlp(mol)
    assert abs(np.diag(S) - 1).max() < 1e-12
    assert abs(S - S.T).max() < 1e-13


def test_energy_nuc():
    mol = gto.M(atom=[[8, (0, 0, 0)], [1, (0, -0.757, 0.587)],
                      [1, (0, 0.757, 0.587)]], basis="sto-3g")
    assert abs(mol.energy_nuc() - 9.188258417746113) < 1e-10


def test_eri_symmetry():
    mol = gto.M(atom="H 0 0 0; H 0 0 0.74", basis="cc-pvdz")
    eri = gto.intor_eri(mol)
    assert abs(eri - eri.transpose(1, 0, 2, 3)).max() < 1e-12
    assert abs(eri - eri.transpose(2, 3, 0, 1)).max() < 1e-12


def test_basis_library_is_vendored():
    """The default basis library lives inside the package (no dependency on
    an external checkout)."""
    import os
    from pyscf_mpcc_tpu.gto import basis as bmod
    path = bmod.find_basis_file("cc-pvdz")
    pkg_dir = os.path.dirname(os.path.abspath(bmod.__file__))
    assert path.startswith(pkg_dir), path
    # aliases and Pople sets resolve too
    for name in ("weigend", "def2-universal-jkfit", "6-31g**", "sto-3g",
                 "cc-pvtz-ri", "aug-cc-pvdz"):
        p = bmod.find_basis_file(name)
        assert os.path.exists(p)


def test_basis_parser_single_token_line():
    """A single-token non-numeric line must be skipped, not raise IndexError
    (operator-precedence regression in the header check)."""
    from pyscf_mpcc_tpu.gto import basis as bmod
    text = """
BASIS "ao basis" PRINT
spherical
H    S
      3.42525091             0.15432897
      0.62391373             0.53532814
      0.16885540             0.44463454
END
"""
    shells = bmod.parse_nwchem(text, "H")
    assert len(shells) == 1 and shells[0][0] == 0


def test_schwarz_screening_far_dimer():
    """Schwarz prescreening (native engine) must not perturb integrals
    above the 1e-14 threshold — checked on a far-separated dimer where
    most shell-pair blocks are negligible."""
    import numpy as np
    from pyscf_mpcc_tpu import gto
    from pyscf_mpcc_tpu.gto import native
    if not native.available():
        return
    mol = gto.M(atom="O 0 0 0; H 0 0 0.96; O 0 0 12.0; H 0 0 12.96",
                basis="sto-3g", unit="angstrom", spin=0)
    eri_n = native.eri4c(mol)
    eri_p = gto.intor_eri.__wrapped__(mol) if hasattr(
        gto.intor_eri, "__wrapped__") else None
    # compare against the pure-NumPy engine (no screening)
    from pyscf_mpcc_tpu.gto import intor
    nao = mol.nao
    pairs = intor._make_pairs(mol)
    ref = np.zeros((nao,) * 4)
    for ip in range(len(pairs)):
        for jp in range(ip + 1):
            pa, pb = pairs[ip], pairs[jp]
            blk = intor._coulomb_block(pa, pb)
            intor._scatter_eri(ref, blk, pa, pb)
            if ip != jp:
                intor._scatter_eri(ref, blk.transpose(2, 3, 0, 1), pb, pa)
    np.testing.assert_allclose(eri_n, ref, atol=5e-12)
    aux = gto.M(atom="O 0 0 0; H 0 0 0.96; O 0 0 12.0; H 0 0 12.96",
                basis={"O": [[0, [1.1, 1.0]], [1, [0.8, 1.0]]],
                       "H": [[0, [0.9, 1.0]]]}, unit="angstrom", spin=0)
    b_n = native.eri3c(mol, aux)
    b_p = intor.intor_3c2e(mol, aux)
    np.testing.assert_allclose(b_n, b_p, atol=5e-12)
