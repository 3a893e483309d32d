from pyscf_mpcc_tpu.lib.diis import DIIS
from pyscf_mpcc_tpu.lib import logger
