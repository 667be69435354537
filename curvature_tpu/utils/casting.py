"""Shared dtype-cast helper (one definition; estimators, eval and the
serving predictor all route through it)."""
import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``; integer /
    bool leaves (labels, indices) pass through unchanged. ``dtype=None``
    returns the tree as-is."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype)
        if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v, tree)
