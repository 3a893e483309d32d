from pyscf_mpcc_tpu.utils.profiling import trace, report_utilization
