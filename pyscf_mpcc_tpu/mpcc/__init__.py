from pyscf_mpcc_tpu.mpcc import masks, rmpccsd, umpccsd, lowlevel, workflow
from pyscf_mpcc_tpu.mpcc.facade import MPCC
