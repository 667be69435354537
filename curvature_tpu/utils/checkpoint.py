"""Checkpointing: factor pytrees and model variables on disk.

The reference persists factor state as torch-pickled dicts keyed by live
layer objects (factors.py:122-129) — unportable across processes. Here state
is a nested dict of arrays keyed by layer *names*, saved as compressed .npz
with path-joined keys; the on-disk naming scheme mirrors the reference's
artifact layout (``<root>/factors/<prefix><model>_<data>_<estimator><suffix>``,
``<results>/<model>/data/<estimator>/...``) so pipelines interoperate.
"""
import os
from typing import Dict, Tuple

import jax
import numpy as np

_SEP = "::"


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for key, val in tree.items():
        if _SEP in str(key):
            # layer names are free-form (module paths from the flax/haiku
            # adapters); a silent collision with the separator would
            # scramble the round-trip instead of failing loudly here
            raise ValueError(
                f"pytree key {key!r} contains the checkpoint separator "
                f"{_SEP!r}; rename the layer/module")
        path = f"{prefix}{_SEP}{key}" if prefix else str(key)
        if isinstance(val, dict):
            out.update(_flatten(val, path))
        else:
            out[path] = np.asarray(val)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, val in flat.items():
        parts = path.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_pytree(path: str, tree: Dict):
    """Save a nested dict-of-arrays pytree as compressed npz."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **_flatten(tree))


def load_pytree(path: str) -> Dict:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def save_pytree_orbax(path: str, tree: Dict):
    """Orbax-backed save for very large factor states (async-capable,
    per-array files, no in-RAM zip staging; npz is fine to ~GB scale).
    ``path`` becomes a checkpoint directory."""
    import orbax.checkpoint as ocp
    _flatten(tree)  # same loud separator validation as the npz path
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree_orbax(path: str, shardings: Dict = None) -> Dict:
    """Restore an orbax checkpoint; with ``shardings`` (a pytree of
    ``jax.sharding.Sharding`` matching the saved structure, e.g. an
    estimator's mesh-sharded factor layout) every array materializes
    DIRECTLY into its mesh placement — no host gather, no replicated
    staging copy. This is how model-parallel factor state (use_mesh's
    model/expert axes) checkpoints round-trip at scale."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        if shardings is None:
            return ckptr.restore(os.path.abspath(path))
        restore_args = jax.tree_util.tree_map(
            lambda sh: ocp.ArrayRestoreArgs(sharding=sh), shardings)
        return ckptr.restore(os.path.abspath(path),
                             restore_args=restore_args)


def factors_path(cfg, estimator: str = None, rank: str = "") -> str:
    """``<root>/factors/<prefix><model>_<data>_<estimator><suffix>[rank]``
    (reference factors.py:70-71, 122-129)."""
    est = estimator or cfg.estimator
    name = f"{cfg.prefix}{cfg.model}_{cfg.data}_{est}{cfg.suffix}{rank}"
    return os.path.join(cfg.root_dir, "factors", name)


def results_paths(cfg, subdir: str = "") -> Tuple[str, str]:
    """(results_path, fig_path) under the reference's layout
    (evaluate.py:325-329)."""
    filename = f"{cfg.prefix}{cfg.model}_{cfg.data}{cfg.suffix}"
    data_dir = os.path.join(cfg.results_dir, cfg.model, "data",
                            cfg.estimator, subdir)
    fig_dir = os.path.join(cfg.results_dir, cfg.model, "figures",
                           cfg.estimator, subdir)
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(fig_dir, exist_ok=True)
    return os.path.join(data_dir, filename), os.path.join(fig_dir, filename)
