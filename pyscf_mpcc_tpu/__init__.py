"""pyscf_mpcc_tpu — a TPU-native coupled-cluster / MP2 engine.

A standalone, from-scratch quantum-chemistry framework with the capability set
of the PySCF fork ``FabianFaulstich/pyscf_mpcc`` (mp, cc, ao2mo, df, mpcc),
re-designed TPU-first:

- AO integrals from a clean-room McMurchie–Davidson engine (``gto``),
- RHF/UHF/ROHF mean field (``scf``),
- density fitting with 3-center B tensors (``df``),
- MP2 / CCSD / CCSD(T) / MP-CC hybrid in JAX (XLA + Pallas + pjit), with
  hot contractions on the MXU and ICI sharding via ``jax.sharding`` meshes.

The compute path is pure-functional JAX: amplitudes are pytrees, the
amplitude update is a single jitted function, and DIIS runs on-device.
"""

__version__ = "0.1.0"

from pyscf_mpcc_tpu import gto  # noqa: F401
