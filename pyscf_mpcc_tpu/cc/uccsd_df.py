"""Compatibility shim: the DF-direct UCCSD path now lives in cc/uccsd.py.

The production update dispatches on whether the UERIs container carries
3-center factors (Lov_*/Lvv_*) or materialized 3-virtual blocks; there is
no longer a separate DF module.  Kept so existing imports stay valid.
"""

from pyscf_mpcc_tpu.cc.uccsd import (UERIs, make_eris_df,  # noqa: F401
                                     update_amps)

UERIsDF = UERIs
