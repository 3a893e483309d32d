from pyscf_mpcc_tpu.scf.hf import RHF, UHF, ROHF, convert_to_uhf
