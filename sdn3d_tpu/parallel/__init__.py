from sdn3d_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_for_batch,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
