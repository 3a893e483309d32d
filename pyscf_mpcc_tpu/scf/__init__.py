from pyscf_mpcc_tpu.lib.compile_cache import enable_compilation_cache

enable_compilation_cache()   # warm-start repeat processes (see module doc)

from pyscf_mpcc_tpu.scf.hf import RHF, UHF, ROHF, convert_to_uhf
from pyscf_mpcc_tpu.scf.ghf import GHF, convert_to_ghf
