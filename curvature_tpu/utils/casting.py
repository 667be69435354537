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


def cast_input(x, dtype):
    """Cast a model input to ``dtype`` only when it is floating-point.
    Integer inputs (causal-LM token ids) must pass through unchanged:
    embedding lookups require integer indexers, so casting them would
    crash every ``--precision bfloat16`` run on token data."""
    if dtype is None or not jnp.issubdtype(jnp.asarray(x).dtype,
                                           jnp.floating):
        return x
    return x.astype(dtype)
