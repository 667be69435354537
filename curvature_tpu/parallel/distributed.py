"""Multi-host / multi-process scaling helpers.

The reference has no distributed runtime at all (SURVEY.md section 2.5);
this module provides the TPU-native one: ``jax.distributed`` process init,
global mesh construction spanning hosts, and per-process batch sharding for
data loaders. Factor updates need no further changes — the per-shard moment
sums combine through the same psums the single-host mesh path uses, riding
ICI within a slice and DCN across slices.
"""
from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize the jax distributed runtime (no-op when single-process
    or already initialized)."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_mesh(axis_sizes: Optional[Dict[str, int]] = None) -> Mesh:
    """Mesh over ALL devices across hosts; defaults to one ``data`` axis."""
    devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    return Mesh(np.asarray(devices).reshape(sizes), names)


def process_batch_slice(global_batch: int) -> slice:
    """The half-open row range of the global batch this process feeds."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def host_local_to_global(x, mesh: Mesh, axis: str = "data"):
    """Assemble per-host batch shards into one globally-sharded array
    (multi-host input pipeline; single-host: a plain device_put)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
