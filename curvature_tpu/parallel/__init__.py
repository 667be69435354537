from curvature_tpu.parallel.mesh import (
    make_mesh, mesh_from_spec, build_mesh, sharded_update_fn, replicate,
    shard_batch,
)
from curvature_tpu.parallel.distributed import (
    initialize, global_mesh, process_batch_slice, host_local_to_global,
)

__all__ = [
    "make_mesh", "mesh_from_spec", "build_mesh", "sharded_update_fn",
    "replicate", "shard_batch",
    "initialize", "global_mesh", "process_batch_slice",
    "host_local_to_global",
]
