from curvature_tpu.parallel.mesh import (
    make_mesh, sharded_update_fn, replicate, shard_batch,
)

__all__ = ["make_mesh", "sharded_update_fn", "replicate", "shard_batch"]
