"""Matrix-free exact curvature operators (GGN = model-distribution Fisher).

For softmax cross-entropy the generalized Gauss-Newton matrix equals the
model-distribution Fisher the estimators approximate from Monte-Carlo label
draws (reference scripts/factors.py:52-61):

    F = (1/B) sum_i J_i^T H_i J_i,   H_i = diag(p_i) - p_i p_i^T

(H = I for the unit-variance Gaussian regression loss). These operators
compute exact products with F without MC noise and without ever
materializing a [p, p] matrix — one forward-mode JVP gives the quadratic
form v^T F v, one extra transpose pass gives the matrix-vector product.
They are the exact limits the sampled-label factor states converge to
(state/(updates*samples) -> F, see estimators/base.py update scaling), which
makes them the ground truth for estimator-fidelity checks (eval/fidelity.py)
and for spectra of the *true* curvature via Lanczos — none of which the
reference can do (its only spectral tool eigendecomposes the KFAC factors,
reference utils.py:21-60).

Everything here is jit-compatible; products restrict to the tracked-layer
parameter blocks (the same blocks the estimators model), with tangents given
in the estimators' matrix view ([out, fan_in(+1)] per layer, bias column
appended — see nn/core.py param_matrix).
"""
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from curvature_tpu.nn.core import (LayerMeta, Model, apply_matrix_delta,
                                   param_matrix)

__all__ = [
    "delta_shapes", "random_deltas", "ggn_quad", "ggn_matvec",
    "lanczos_topk", "hutchinson_trace",
]


def delta_shapes(metas: Dict[str, LayerMeta]) -> Dict[str, Tuple[int, ...]]:
    """Matrix-view delta shape per tracked layer (stacked axis included)."""
    return {
        name: ((m.stacked,) if m.stacked else ())
        + (m.out_features, m.mat_cols)
        for name, m in metas.items()
    }


def random_deltas(metas: Dict[str, LayerMeta], rng: jax.Array,
                  kind: str = "rademacher",
                  dtype=jnp.float32) -> Dict[str, jax.Array]:
    """A random probe pytree in the estimators' matrix view."""
    out = {}
    for name, shape in delta_shapes(metas).items():
        rng, key = jax.random.split(rng)
        if kind == "rademacher":
            out[name] = jax.random.rademacher(key, shape, dtype)
        else:
            out[name] = jax.random.normal(key, shape, dtype)
    return out


def _forward_fn(model: Model, variables: Dict, x: jax.Array, train: bool):
    batch_stats = variables.get("batch_stats", {})

    def f(params):
        out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=train)
        return out

    return variables["params"], f


def _tangent(metas, params, deltas):
    """Zero params-pytree tangent except the tracked matrix-view deltas."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return apply_matrix_delta(metas, zeros, deltas)


def _h_quad(loss: str, logits: jax.Array, u: jax.Array) -> jax.Array:
    """sum_i u_i^T H_i u_i for the loss's output-space Hessian H."""
    if loss == "gaussian":
        return jnp.sum(u * u)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(p * u * u) - jnp.sum(jnp.sum(p * u, axis=-1) ** 2)


def _h_apply(loss: str, logits: jax.Array, u: jax.Array) -> jax.Array:
    """H_i u_i per sample."""
    if loss == "gaussian":
        return u
    p = jax.nn.softmax(logits, axis=-1)
    return p * u - p * jnp.sum(p * u, axis=-1, keepdims=True)


def ggn_quad(model: Model,
             metas: Dict[str, LayerMeta],
             variables: Dict,
             x: jax.Array,
             deltas: Dict[str, jax.Array],
             loss: str = "cross_entropy",
             train: bool = True) -> jax.Array:
    """v^T F v with F the batch-mean GGN/Fisher — ONE forward JVP, no
    backward pass: v^T J^T H J v = (Jv)^T H (Jv)."""
    params, f = _forward_fn(model, variables, x, train)
    logits, u = jax.jvp(f, (params,), (_tangent(metas, params, deltas),))
    return _h_quad(loss, logits, u) / x.shape[0]


def ggn_matvec(model: Model,
               metas: Dict[str, LayerMeta],
               variables: Dict,
               x: jax.Array,
               deltas: Dict[str, jax.Array],
               loss: str = "cross_entropy",
               train: bool = True) -> Dict[str, jax.Array]:
    """F v restricted to the tracked blocks, in the matrix view.

    Linearizes once so the JVP and its transpose share the forward residuals
    (J and J^T of the same linearization point).
    """
    params, f = _forward_fn(model, variables, x, train)
    logits, f_lin = jax.linearize(f, params)
    u = f_lin(_tangent(metas, params, deltas))
    hu = _h_apply(loss, logits, u) / x.shape[0]
    (grads,) = jax.linear_transpose(f_lin, params)(hu)
    return {name: param_matrix(metas[name], grads[name]) for name in metas}


def lanczos_topk(matvec: Callable[[Dict[str, jax.Array]], Dict[str, jax.Array]],
                 example: Dict[str, jax.Array],
                 k: int,
                 rng: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Top Ritz values of a symmetric PSD operator via k Lanczos steps.

    Full reorthogonalization (the Krylov basis Q [k, p] lives on device —
    budget k*p floats of HBM; k <= ~64 covers ResNet-50-sized blocks).
    Returns (ritz_values desc [k], first-component weights [k]); the weights
    are the spectral-density moments nu_j = (q_0^T y_j)^2 for Lanczos
    quadrature.
    """
    v0, unravel = ravel_pytree(example)
    p = v0.shape[0]
    q0 = jax.random.normal(rng, (p,), v0.dtype)
    q0 = q0 / jnp.linalg.norm(q0)

    def flat_matvec(q):
        out = matvec(unravel(q))
        return ravel_pytree(out)[0]

    def body(carry, j):
        basis, q = carry
        basis = basis.at[j].set(q)
        w = flat_matvec(q)
        alpha = q @ w
        # full reorthogonalization against every stored basis vector
        # subsumes the classic three-term recurrence (unfilled rows are
        # zero, so their projections are no-ops)
        w = w - alpha * q
        w = w - basis.T @ (basis @ w)
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        return (basis, q_next), (alpha, beta)

    basis0 = jnp.zeros((k, p), v0.dtype)
    _, (alphas, betas) = jax.lax.scan(body, (basis0, q0), jnp.arange(k))
    t = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    evals, evecs = jnp.linalg.eigh(t)
    order = jnp.argsort(evals)[::-1]
    return evals[order], (evecs[0, :] ** 2)[order]


def hutchinson_trace(quad: Callable[[Dict[str, jax.Array]], jax.Array],
                     metas: Dict[str, LayerMeta],
                     rng: jax.Array,
                     num_probes: int = 16) -> jax.Array:
    """tr(F) estimate from Rademacher quadratic forms: E[v^T F v] = tr(F)."""
    keys = jax.random.split(rng, num_probes)
    vals = [quad(random_deltas(metas, key)) for key in keys]
    return jnp.mean(jnp.stack(vals))
