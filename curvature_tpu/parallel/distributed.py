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
    or already initialized).

    Must run before anything touches the XLA backend — so the
    already-initialized check reads the distributed client state directly
    instead of calling jax.process_count(), which would itself initialize
    the backend and make jax.distributed.initialize unusable."""
    if coordinator_address is None:
        return  # single-process
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        if is_init():
            return  # already initialized
    else:  # older jax: fall back to the internal client state
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return
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


def host_local_to_global(x, mesh: Mesh, axis: str = "data",
                         spec: Optional[P] = None):
    """Assemble per-host batch shards into one globally-sharded array
    (multi-host input pipeline; single-host: a plain device_put).

    ``spec`` overrides the default leading-axis PartitionSpec (e.g.
    ``P(None, "data")`` for [S, B] Monte-Carlo label arrays)."""
    sharding = NamedSharding(mesh, spec if spec is not None else P(axis))
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
