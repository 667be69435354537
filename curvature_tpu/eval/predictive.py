"""Closed-form Laplace predictives (extension beyond the reference).

The reference's only predictive is the MC average of sampled-weight softmax
passes (scripts/evaluate.py:121-152). Two standard closed-form alternatives
operate on the Gaussian over *logits* induced by the weight posterior
(moments estimated from the same vmapped logit ensemble, so no extra
forwards):

* probit mean-field: E[softmax(z)] ~ softmax(mu / sqrt(1 + pi/8 * var))
  (MacKay 1992 generalized to softmax, the standard laplace-torch default).
* Laplace bridge: map N(mu, var) on logits to a Dirichlet(alpha) on the
  simplex (Hobbhahn et al., 2022) — gives a full distribution over
  probabilities, not just a mean:
      alpha_k = (1 - 2/K + exp(mu_k)/K^2 * sum_j exp(-mu_j)) / var_k
  with predictive mean alpha / sum(alpha).

Both shrink toward the uniform distribution as logit variance grows. At
vanishing variance the probit reduces to plain softmax(mu) (tested); the
bridge — whose practical recipe standardizes by the total variance —
sharpens toward the argmax one-hot instead, finitely and
argmax-preservingly (tested).
"""
from typing import Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def probit_mean_field(mu: jax.Array, var: jax.Array) -> jax.Array:
    """Mean-field probit-approximate predictive: [..., K] probabilities."""
    kappa = 1.0 / jnp.sqrt(1.0 + (jnp.pi / 8.0) * var)
    return jax.nn.softmax(kappa * mu, axis=-1)


def laplace_bridge(mu: jax.Array, var: jax.Array,
                   eps: float = 1e-8) -> Tuple[jax.Array, jax.Array]:
    """Gaussian-on-logits -> Dirichlet(alpha); returns (alpha, mean probs).

    The bridge is scale-sensitive; inputs are standardized by the mean
    total variance as in the paper's practical recipe. The mean is
    computed in LOG space: the naive exp(mu_k) * sum_j exp(-mu_j) term
    overflows f32 once |mu|/scale exceeds ~88 (which a near-zero logit
    variance guarantees, since the standardization divides by sqrt(var));
    softmax over log alpha gives the same mean without ever materializing
    alpha. The returned alpha itself may still be inf in that regime —
    the mean is the quantity the predictive uses.
    """
    k = mu.shape[-1]
    # standardize: the bridge assumes sum(var) ~ K^2 / 2 scaling
    scale = jnp.sqrt(jnp.sum(var, axis=-1, keepdims=True) / (k / 2.0) + eps)
    mu = mu / scale
    var = jnp.maximum(var / (scale * scale), eps)
    # log(exp(mu_k) * sum_j exp(-mu_j) / k^2), stabilized
    log_cross = mu + jax.scipy.special.logsumexp(-mu, axis=-1,
                                                 keepdims=True) \
        - 2.0 * jnp.log(float(k))
    log_alpha = jnp.logaddexp(jnp.log(1.0 - 2.0 / k), log_cross) \
        - jnp.log(var)
    mean = jax.nn.softmax(log_alpha, axis=-1)
    return jnp.exp(log_alpha), mean


def _mesh_wrap(raw_fwd, mesh, data_axis, x_argnum):
    """Shard argument ``x_argnum`` over the mesh's data axis (everything
    else replicated); ragged batches fall back to the plain program."""
    jit_plain = jax.jit(raw_fwd)
    if mesh is None:
        return jit_plain
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(data_axis))
    import inspect
    n_args = len(inspect.signature(raw_fwd).parameters)
    shardings = tuple(sh if i == x_argnum else rep for i in range(n_args))
    jit_sharded = jax.jit(raw_fwd, in_shardings=shardings,
                          out_shardings=rep)

    def fwd(*args):
        ok = args[x_argnum].shape[0] % mesh.shape[data_axis] == 0
        return (jit_sharded if ok else jit_plain)(*args)
    return fwd


def make_logit_ensemble_fn(model, mesh=None, data_axis: str = "data"):
    """Jitted per-sample LOGIT forward over an ensemble axis: [S, B, K].
    With ``mesh`` the batch shards over the data axis (--parallel)."""
    def raw(ensemble_params, batch_stats, x):
        def one(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=False)
            return logits
        return jax.vmap(one)(ensemble_params)
    return _mesh_wrap(raw, mesh, data_axis, 2)


def eval_bnn_closed_form(model, variables, estimator, data: Iterable,
                         samples: int = 30,
                         rng: Optional[jax.Array] = None,
                         method: str = "probit", mesh=None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form Bayesian predictive from the sampled logit ensemble.

    Runs the same vmapped ensemble forward as ``eval_bnn`` but keeps
    logits, estimates per-input logit mean/variance across the ensemble,
    and applies the chosen closed-form predictive. Returns
    (predictions [N, K], labels [N]).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if method not in ("probit", "bridge"):
        raise ValueError(f"unknown closed-form method {method!r}")
    ensemble = estimator.ensemble_params(rng, samples)
    batch_stats = variables.get("batch_stats", {})
    fwd = make_logit_ensemble_fn(model, mesh=mesh)

    @jax.jit
    def predictive(logits_s):
        mu = jnp.mean(logits_s, axis=0)
        var = jnp.var(logits_s, axis=0)
        if method == "probit":
            return probit_mean_field(mu, var)
        return laplace_bridge(mu, var)[1]

    preds, labels = [], []
    for x, y in data:
        logits_s = fwd(ensemble, batch_stats, jnp.asarray(x))
        preds.append(np.asarray(predictive(logits_s)))
        labels.append(np.asarray(y))
    return np.concatenate(preds), np.concatenate(labels)


def eval_bnn_regression(model, variables, estimator, data: Iterable,
                        samples: int = 30,
                        rng: Optional[jax.Array] = None,
                        linearized: bool = True,
                        noise_var: float = 1.0):
    """Bayesian regression predictive: mean, variance, labels.

    Completes the regression story the reference only hints at (it ships
    uci/sarcos/kuka loaders, datasets.py:192-262, but no regression
    evaluation). The epistemic variance is the ensemble variance of the
    outputs — through the MAP-linearized network by default (for a
    Gaussian-likelihood Laplace posterior this converges to the exact
    x^T Sigma x GLM variance) — and the returned variance adds the
    observation noise ``noise_var`` (the unit-variance Fisher convention
    of ``loss='gaussian'``). Returns (mean [N, D], var [N, D],
    labels [N, D]).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    ensemble = estimator.ensemble_params(rng, samples)
    mean_params = estimator.mean_params
    batch_stats = variables.get("batch_stats", {})
    if linearized:
        fwd = make_linearized_ensemble_fn(model)
    else:
        raw = make_logit_ensemble_fn(model)
        fwd = lambda m, e, bs, x: (None, raw(e, bs, x))  # noqa: E731

    means, variances, labels = [], [], []
    for x, y in data:
        _, out_s = fwd(mean_params, ensemble, batch_stats, jnp.asarray(x))
        means.append(np.asarray(jnp.mean(out_s, axis=0)))
        variances.append(np.asarray(jnp.var(out_s, axis=0) + noise_var))
        labels.append(np.asarray(y))
    return (np.concatenate(means), np.concatenate(variances),
            np.concatenate(labels))


def make_linearized_ensemble_fn(model, mesh=None, data_axis: str = "data"):
    """Jitted linearized-ensemble forward: MAP logits + J(x)·(θ_s − θ_MAP).

    ``jax.linearize`` traces the MAP forward ONCE per batch; each posterior
    sample is then one jvp (a single extra forward-cost pass on the MXU),
    vmapped over the sample axis — same cost shape as the sampled-weight
    ensemble but through the linearized network. With ``mesh`` the batch
    shards over the data axis (--parallel).
    """
    def fwd(mean_params, ensemble_params, batch_stats, x):
        def f(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=False)
            return logits
        logits0, jvp = jax.linearize(f, mean_params)
        tangents = jax.tree_util.tree_map(
            lambda e, m: e - m[None].astype(e.dtype), ensemble_params,
            mean_params)
        lin = jax.vmap(jvp)(tangents)                       # [S, B, K]
        return logits0, logits0[None] + lin
    return _mesh_wrap(fwd, mesh, data_axis, 3)


def eval_bnn_linearized(model, variables, estimator, data: Iterable,
                        samples: int = 30,
                        rng: Optional[jax.Array] = None,
                        method: str = "mc", mesh=None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Linearized-Laplace (GLM) predictive (Immer et al., 2021).

    The Laplace posterior is a Gaussian around θ_MAP, but pushing *sampled
    weights* through the full nonlinear network (the reference's only
    predictive, scripts/evaluate.py:121-152) can leave the regime where the
    quadratic approximation holds. The GLM predictive evaluates the
    network LINEARIZED at the MAP instead: f_lin(x, θ) = f(x, θ_MAP) +
    J(x)(θ − θ_MAP) — consistent with the GGN/Fisher curvature the
    factors estimate, and empirically better calibrated at large prior
    variance. ``method``: 'mc' averages softmax over linearized-logit
    samples; 'probit'/'bridge' apply the closed-form predictives to the
    linearized logit moments. Returns (predictions [N, K], labels [N]).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if method not in ("mc", "probit", "bridge"):
        raise ValueError(f"unknown linearized method {method!r}")
    ensemble = estimator.ensemble_params(rng, samples)
    mean_params = estimator.mean_params
    batch_stats = variables.get("batch_stats", {})
    fwd = make_linearized_ensemble_fn(model, mesh=mesh)

    @jax.jit
    def predictive(logits0, logits_s):
        if method == "mc":
            return jnp.mean(jax.nn.softmax(logits_s, axis=-1), axis=0)
        var = jnp.var(logits_s, axis=0)
        if method == "probit":
            return probit_mean_field(logits0, var)
        return laplace_bridge(logits0, var)[1]

    preds, labels = [], []
    for x, y in data:
        logits0, logits_s = fwd(mean_params, ensemble, batch_stats,
                                jnp.asarray(x))
        preds.append(np.asarray(predictive(logits0, logits_s)))
        labels.append(np.asarray(y))
    return np.concatenate(preds), np.concatenate(labels)
