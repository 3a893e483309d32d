from pyscf_mpcc_tpu.lib.compile_cache import enable_compilation_cache

enable_compilation_cache()   # warm-start repeat processes (see module doc)

from pyscf_mpcc_tpu.mp import mp2, ump2, gmp2
from pyscf_mpcc_tpu.mp.dfmp2 import DFRMP2, SCSDFRMP2
from pyscf_mpcc_tpu.mp.gmp2 import GMP2
