from pyscf_mpcc_tpu.scf.hf import RHF, UHF, ROHF, convert_to_uhf
from pyscf_mpcc_tpu.scf.ghf import GHF, convert_to_ghf
