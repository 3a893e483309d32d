from pyscf_mpcc_tpu.ao2mo.incore import full, general
