from pyscf_mpcc_tpu.lib.compile_cache import enable_compilation_cache

enable_compilation_cache()   # warm-start repeat processes (see module doc)

from pyscf_mpcc_tpu.cc.driver import CCSD, RCCSDDriver, UCCSDDriver
from pyscf_mpcc_tpu.cc import (ccsd_t, ccsdt_act, ccsdt_env, eris,
                               gccsd_slow, gccsd_t_slow, gccsd_t_rdm,
                               lambda_ad, qcisd, rccsd, uccsd,
                               uccsd_t_rdm)
from pyscf_mpcc_tpu.cc.gccsd import GCCSD
from pyscf_mpcc_tpu.cc.momgfccsd import MomGFCCSD
