from pyscf_mpcc_tpu.mp import mp2
