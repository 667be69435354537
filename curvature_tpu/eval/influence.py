"""Influence functions from curvature inverse-vector products.

Koh & Liang (2017): the influence of a training example ``z`` on the loss
at a test point ``z'`` is

    I(z, z') = - g(z')^T  H^{-1}  g(z),

with ``H`` the (damped) curvature at the MAP and ``g`` per-example loss
gradients. Every estimator here exposes the exact inverse application
``precision_solve`` (P^{-1} v, estimators/base.py) for its own damped
precision, so influence needs ONE solve for the test gradient and one
vmapped per-example gradient pass over the candidates — no LiSSA /
conjugate-gradient iterations, no convergence knobs.

``self_influence`` (I(z, z) with the per-example gradient on both sides)
is the classic memorization / atypicality score (Feldman & Zhang, 2020).

Extension beyond the reference: DLR-RM/curvature computes curvature only
to SAMPLE from the Laplace posterior (curvatures.py:104-129); it has no
inverse application and no data-attribution surface at all.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import param_matrix

__all__ = ["loss_grad_matrix", "per_example_grad_matrix",
           "influence_scores", "self_influence"]


def _loss_sum(model, variables, x, y, loss: str):
    """Summed loss over the batch (sum, not mean: influence is defined per
    example; token models sum over label positions)."""
    logits, _ = model.apply(variables, x, train=True)
    if loss == "gaussian":
        return 0.5 * jnp.sum((logits - y) ** 2)
    logits = logits.reshape((-1, logits.shape[-1]))
    labels = y.reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def loss_grad_matrix(model, metas: Dict, variables: Dict, x, y,
                     loss: str = "cross_entropy") -> Dict[str, jax.Array]:
    """Gradient of the summed batch loss, restricted to the tracked blocks,
    in the estimators' matrix view."""
    bs = {"batch_stats": variables.get("batch_stats", {})}

    def f(params):
        return _loss_sum(model, {"params": params, **bs}, x, y, loss)

    g = jax.grad(f)(variables["params"])
    return {n: param_matrix(metas[n], g[n]) for n in metas}


def per_example_grad_matrix(model, metas: Dict, variables: Dict, x, y,
                            loss: str = "cross_entropy"
                            ) -> Dict[str, jax.Array]:
    """[N, ...]-stacked per-example loss gradients in the matrix view
    (one vmapped backward, shared over the batch)."""
    def one(xi, yi):
        return loss_grad_matrix(model, metas, variables, xi[None], yi[None],
                                loss)
    return jax.vmap(one)(x, y)


def influence_scores(est, x_train, y_train, x_test, y_test,
                     add: float = 1.0, multiply: float = 1.0,
                     test_grad: Optional[Dict] = None) -> jax.Array:
    """``[N_train]`` influences of each train example on the test loss.

    Negative scores are HELPFUL examples (their upweighting lowers the test
    loss), positive ones harmful. ``add``/``multiply`` are the estimator's
    usual damping knobs — use the hyperopt/marglik-tuned values so the
    inverse is the same posterior precision the predictive uses. Pass
    ``test_grad`` to reuse a precomputed test gradient across many
    candidate batches.
    """
    if test_grad is None:
        test_grad = loss_grad_matrix(est.model, est.metas, est.variables,
                                     x_test, y_test, est.loss)
    solved = est.precision_solve(test_grad, add, multiply)
    grads = per_example_grad_matrix(est.model, est.metas, est.variables,
                                    x_train, y_train, est.loss)
    return -sum(jnp.einsum("n...,...->n", grads[name], solved[name])
                for name in est.metas)


def self_influence(est, x, y, add: float = 1.0,
                   multiply: float = 1.0) -> jax.Array:
    """``[N]`` self-influences ``g_i^T P^{-1} g_i`` — the memorization /
    atypicality score of each example under the fitted curvature."""
    from curvature_tpu.estimators.base import normalize_damping
    grads = per_example_grad_matrix(est.model, est.metas, est.variables,
                                    x, y, est.loss)
    a, m = normalize_damping(add, multiply, len(est.metas))
    inv = est._wrap_inv(est._jit_invert(est.state, a, m))
    solved = jax.vmap(lambda g: est.solve_state(inv, g))(grads)
    return sum(jnp.einsum("n...,n...->n", grads[name], solved[name])
               for name in est.metas)
