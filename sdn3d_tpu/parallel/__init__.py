from sdn3d_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_for_batch,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    initialize_multihost,
    make_multihost_mesh,
    multihost_batch_sharding,
    local_batch_slice,
)
