from pyscf_mpcc_tpu.ci import fci_slow
