from pyscf_mpcc_tpu.mpcc import masks, rmpccsd
