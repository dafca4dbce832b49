"""Device-mesh scale-out (replaces the reference's nn.DataParallel)."""

from adaptsegnet_tpu.parallel.mesh import (
    auto_mesh_size,
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
)

__all__ = ["auto_mesh_size", "make_mesh", "batch_sharding", "replicate", "shard_batch"]
