"""Multi-chip scaling for factor estimation and Bayesian evaluation.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(reference utils.py:369, factors.py:86-87). The TPU-native replacement:

  * a ``jax.sharding.Mesh`` with a ``data`` axis (batch sharding) and an
    optional ``sample`` axis (Monte-Carlo posterior samples);
  * factor accumulation is a sum over the batch, so per-shard moments combine
    with one ``psum`` over ICI — mathematically exact;
  * factors and model parameters stay replicated; Bayesian eval fans the
    sample ensemble out over the mesh.
"""
from functools import partial
from typing import Dict, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; default puts all devices on a single ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    n = 1
    for s in sizes:
        n *= s
    if n != len(devices):
        raise ValueError(f"mesh {axis_sizes} != {len(devices)} devices")
    import numpy as np
    return Mesh(np.asarray(devices).reshape(sizes), names)


def mesh_from_spec(spec: str, devices: Optional[Sequence] = None) -> Mesh:
    """Parse an axis spec like ``"data:8"`` or ``"sample:2,data:4"``."""
    axes: Dict[str, int] = {}
    for part in spec.split(","):
        name, sep, size = part.partition(":")
        if not sep or not name.strip():
            raise ValueError(
                f"bad mesh spec {spec!r}: expected 'name:size[,name:size]'")
        axes[name.strip()] = int(size)
    return make_mesh(axes, devices)


def build_mesh(cfg) -> Optional[Mesh]:
    """The pipeline CLIs' mesh from config: ``--mesh`` (explicit axis spec)
    or ``--parallel`` (all devices on one ``data`` axis — the analogue of
    the reference's ``--parallel`` DataParallel flag, utils.py:369).
    Returns None when neither is set."""
    spec = getattr(cfg, "mesh", "")
    if spec:
        return mesh_from_spec(spec)
    if getattr(cfg, "parallel", False):
        return make_mesh()
    return None


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) axis over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(x, sharding)


def sharded_update_fn(estimator, mesh: Mesh, data_axis: str = "data"):
    """Jitted factor-update step with the batch sharded over ``data_axis``.

    Factor state stays replicated: XLA turns the cross-shard factor sums into
    psums over ICI (the exact analogue of summing per-device ``aa^T``/``gg^T``
    moments). Labels shape [S, B]; B must divide the data-axis size.
    """
    rep = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(None, data_axis))
    x_sharded = NamedSharding(mesh, P(data_axis))

    @partial(jax.jit,
             in_shardings=(rep, rep, x_sharded, batch_sharded),
             out_shardings=rep)
    def step(state, variables, x, labels):
        return estimator._step(state, variables, x, labels)

    return step
