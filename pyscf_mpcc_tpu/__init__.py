"""pyscf_mpcc_tpu — a TPU-native coupled-cluster / MP2 engine.

A standalone, from-scratch quantum-chemistry framework with the capability
set of the PySCF fork ``FabianFaulstich/pyscf_mpcc`` (mp, cc, ao2mo, df,
mpcc), re-designed TPU-first:

- AO integrals from a clean-room McMurchie-Davidson engine (``gto``,
  NumPy + native C++/OpenMP),
- RHF/UHF/ROHF mean field (``scf``),
- density fitting with 3-center B tensors (``df``),
- MP2 / CCSD / CCSD(T) / Lambda-RDM / EOM / MP-CC hybrid in JAX
  (XLA + pjit + functional transforms), hot contractions on the MXU,
  ICI sharding via ``jax.sharding`` meshes (``parallel``),
- Pipek-Mezey localization and AVAS (``lo``), determinant FCI oracle
  (``ci``).

See README.md for the layer map and STATUS.md for the component
inventory against the reference.
"""

__version__ = "0.1.0"

from pyscf_mpcc_tpu import gto  # noqa: F401


def M(**kwargs):
    """Build a molecule (reference pyscf.M convenience, __init__.py:106):
    ``pyscf_mpcc_tpu.M(atom=..., basis=...)``."""
    return gto.M(**kwargs)
