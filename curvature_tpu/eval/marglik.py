"""Laplace log marginal likelihood (model evidence).

Extension beyond the reference: the Laplace approximation gives the model
evidence in closed form,

    log p(D) ~ log p(D | theta*) + log p(theta*) + (d/2) log 2pi
               - (1/2) logdet P,

with P the posterior precision (here: the damped curvature the sampler
actually uses) and a Gaussian prior N(0, 1/add) whose precision is the
``add`` damping term. The 2pi factors of the prior and the Laplace volume
cancel exactly, leaving

    log p(D) = -NLL_sum(theta*)
               + (1/2) * sum_layers [ d_l log(add_l) - add_l ||theta_l||^2 ]
               - (1/2) logdet P(add, multiply).

The flagship use (Immer et al., 2021; laplace-torch's marglik tuning) is
tuning the damping WITHOUT any validation passes: the MAP NLL term is
constant in (add, multiply), so each candidate costs one per-layer logdet —
pure small-matrix linear algebra, no forward passes at all
(``--objective marglik`` in pipelines/hyper.py). Only parameters covered by
the estimator's layer set enter (subnetwork-Laplace semantics: untracked
parameters are treated as fixed at the MAP).
"""
import functools
import math
from typing import Iterable

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import normalize_damping
from curvature_tpu.nn.core import param_matrix


def dataset_map_nll(model, variables, data: Iterable,
                    loss: str = "cross_entropy") -> float:
    """Sum of -log p(y | x, theta_MAP) over a dataset (natural log).

    ``loss='gaussian'`` scores unit-variance regression:
    0.5*||y - f||^2 + (D/2) log 2pi per example.
    """
    @jax.jit
    def batch_nll(variables, x, y):
        out, _ = model.apply(variables, x, train=False)
        if loss == "gaussian":
            sq = jnp.sum((out - y) ** 2, axis=-1)
            return jnp.sum(0.5 * sq + 0.5 * out.shape[-1] * math.log(2 * math.pi))
        logp = jax.nn.log_softmax(out, axis=-1)
        # rank-polymorphic: [B] class labels or [B, T] per-token LM labels
        return -jnp.sum(jnp.take_along_axis(logp, y[..., None], axis=-1))

    total = 0.0
    for x, y in data:
        total += float(batch_nll(variables, jnp.asarray(x), jnp.asarray(y)))
    return total


def covered_params(est):
    """(d, ||theta||^2) per tracked layer, in meta order."""
    counts, sq = [], []
    for name, meta in est.metas.items():
        mat = param_matrix(meta, est.mean_params[name])
        counts.append(mat.size)
        sq.append(float(jnp.sum(mat.astype(jnp.float32) ** 2)))
    return np.asarray(counts, np.float64), np.asarray(sq, np.float64)


def marglik_gradient_tune(est, nll_sum: float, steps: int = 200,
                          lr: float = 0.1, pre_scale: float = 1.0,
                          init=(0.0, 0.0), per_layer: bool = False):
    """Tune damping by gradient ASCENT on the Laplace evidence.

    The evidence's damping-dependent part (prior term + logdet of the
    posterior precision) is ordinary differentiable JAX code — Cholesky
    and eigh gradients included — so the whole search is one jitted Adam
    loop over (log10 norm, log10 scale); the MAP NLL is a constant and is
    never recomputed. With ``per_layer=True`` all 2L per-layer dampings
    are tuned JOINTLY (gradients make the 2L-dimensional search no harder
    than the 2-dimensional one — something the reference's black-box
    BayesOpt fundamentally cannot do, and the CLI's coordinate descent
    only approximates).

    Returns ``{"norms", "scales", "log_marglik", "trace"}`` with
    per-layer arrays (shared values broadcast when per_layer=False).
    """
    import optax

    num_layers = len(est.metas)
    counts, theta_sq = covered_params(est)
    counts_j = jnp.asarray(counts, jnp.float32)
    theta_j = jnp.asarray(theta_sq, jnp.float32)

    def neg_evidence(params, state):
        la, ls = params[0], params[1]
        add = jnp.broadcast_to(10.0 ** la, (num_layers,))
        mult = jnp.broadcast_to(pre_scale * 10.0 ** ls, (num_layers,))
        prior = 0.5 * jnp.sum(counts_j * jnp.log(add) - add * theta_j)
        return -(prior - 0.5 * est.logdet_state(state, add, mult))

    opt = optax.adam(lr)

    @functools.partial(jax.jit, static_argnums=2)
    def run(params, state, n):
        # the whole ascent is ONE program (lax.scan over steps) — a Python
        # loop would sync to host per step: n round trips on the remote
        # backend for sub-millisecond logdet math
        opt_state = opt.init(params)

        def body(carry, _):
            params, opt_state = carry
            val, g = jax.value_and_grad(neg_evidence)(params, state)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, updates), opt_state), val

        (params, _), vals = jax.lax.scan(body, (params, opt_state),
                                         None, length=n)
        return params, vals, neg_evidence(params, state)

    shape = (2, num_layers) if per_layer else (2,)
    params = jnp.broadcast_to(
        jnp.asarray(init, jnp.float32).reshape(2, *([1] * (len(shape) - 1))),
        shape).astype(jnp.float32)
    params, vals, final_neg = run(params, est.state, int(steps))
    trace = [float(v) for v in np.asarray(vals)]
    final = -float(final_neg) - float(nll_sum)
    p = np.asarray(params, np.float64)
    norms = np.broadcast_to(10.0 ** p[0], (num_layers,)).copy()
    scales = np.broadcast_to(10.0 ** p[1], (num_layers,)).copy()
    return {"norms": norms, "scales": scales, "log_marglik": final,
            "trace": trace}


def log_marginal_likelihood(est, nll_sum: float, add, multiply) -> float:
    """Laplace evidence for the damped posterior precision P(add, multiply).

    ``add`` is the per-layer (or scalar) Gaussian prior precision and must
    be > 0; ``multiply`` scales the curvature (the reference's
    ``pre_scale * scale``, the effective dataset size).
    """
    add_l, mult_l = normalize_damping(add, multiply, len(est.metas))
    add_np = np.asarray(add_l, np.float64)
    if not (add_np > 0).all():
        raise ValueError("marginal likelihood needs prior precision add > 0")
    counts, theta_sq = covered_params(est)
    prior_term = 0.5 * float(
        np.sum(counts * np.log(add_np) - add_np * theta_sq))
    logdet = est.logdet_precision(add_l, mult_l)
    return -float(nll_sum) + prior_term - 0.5 * logdet
