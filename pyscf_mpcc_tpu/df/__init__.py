from pyscf_mpcc_tpu.df.df import DF, make_auxmol
