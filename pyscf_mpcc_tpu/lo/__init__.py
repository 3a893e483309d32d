from pyscf_mpcc_tpu.lo.pm import PipekMezey, lowdin_populations, pm_localize
from pyscf_mpcc_tpu.lo.avas import avas
