from pyscf_mpcc_tpu.parallel.mesh import (
    make_mesh, shard_eris, shard_amps, sharded_update_amps,
    shard_ueris, shard_uamps, sharded_uccsd_update,
)
