"""Serving-style Bayesian predictor.

Bundles a model, its MAP variables and a fitted estimator into a jitted
predictive distribution with uncertainty decomposition — the deployment
surface for the Laplace posterior the reference only exposes through
script loops (scripts/evaluate.py:121-152):

  * predictive mean:     E_s[softmax(f(theta_s, x))]
  * total uncertainty:   H(mean)                       (predictive entropy)
  * aleatoric:           E_s[H(softmax_s)]
  * epistemic (BALD):    H(mean) - E_s[H(softmax_s)]   (mutual information)

The posterior ensemble is drawn once at construction; prediction is one
vmapped forward. With a mesh, the sample axis shards across devices.
"""
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from curvature_tpu.utils.casting import cast_input as _cast_input


class Prediction(NamedTuple):
    mean: jax.Array          # [B, K] posterior-mean class probabilities
    entropy: jax.Array       # [B] total predictive entropy
    aleatoric: jax.Array     # [B] expected per-sample entropy
    epistemic: jax.Array     # [B] BALD mutual information


def _entropy(p):
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=-1)


class BayesianPredictor:
    def __init__(self, model, variables: Dict, estimator, samples: int = 30,
                 rng: Optional[jax.Array] = None, mesh=None,
                 sample_axis: str = "sample", compute_dtype=None):
        """compute_dtype=jnp.bfloat16 runs the ensemble forwards on the
        MXU's native dtype; softmax/entropies stay in f32."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        self.model = model
        self.batch_stats = variables.get("batch_stats", {})
        self.ensemble = estimator.ensemble_params(rng, samples)
        self.mean_params = estimator.mean_params
        if compute_dtype is not None:
            from curvature_tpu.utils.casting import cast_floats
            self.ensemble = cast_floats(self.ensemble, compute_dtype)
            self.mean_params = cast_floats(self.mean_params, compute_dtype)
        self.samples = samples

        def predict(ensemble, batch_stats, x):
            if compute_dtype is not None:
                x = _cast_input(x, compute_dtype)

            def one(p):
                logits, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x, train=False)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs_s = jax.vmap(one)(ensemble)            # [S, B, K]
            mean = jnp.mean(probs_s, axis=0)
            total = _entropy(mean)
            aleatoric = jnp.mean(_entropy(probs_s), axis=0)
            return Prediction(mean, total, aleatoric, total - aleatoric)

        def predict_cf(ensemble, batch_stats, x, use_bridge):
            from curvature_tpu.eval.predictive import (laplace_bridge,
                                                       probit_mean_field)
            if compute_dtype is not None:
                x = _cast_input(x, compute_dtype)

            def one(p):
                logits, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x,
                    train=False)
                return logits.astype(jnp.float32)
            logits_s = jax.vmap(one)(ensemble)           # [S, B, K]
            mu = jnp.mean(logits_s, axis=0)
            var = jnp.var(logits_s, axis=0)
            mean = jnp.where(use_bridge,
                             laplace_bridge(mu, var)[1],
                             probit_mean_field(mu, var))
            probs_s = jax.nn.softmax(logits_s, axis=-1)
            total = _entropy(mean)
            aleatoric = jnp.mean(_entropy(probs_s), axis=0)
            return Prediction(mean, total, aleatoric, total - aleatoric)

        def predict_lin(mean_params, ensemble, batch_stats, x):
            # GLM / linearized-Laplace predictive (eval/predictive.py):
            # logits = f(MAP) + J(x) (theta_s - MAP), one linearize +
            # vmapped jvps — consistent with the GGN/Fisher curvature
            if compute_dtype is not None:
                x = _cast_input(x, compute_dtype)

            def f(p):
                logits, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x,
                    train=False)
                return logits.astype(jnp.float32)
            logits0, jvp = jax.linearize(f, mean_params)
            tangents = jax.tree_util.tree_map(
                lambda e, m: e - m[None].astype(e.dtype), ensemble,
                mean_params)
            logits_s = logits0[None] + jax.vmap(jvp)(tangents)  # [S, B, K]
            probs_s = jax.nn.softmax(logits_s, axis=-1)
            mean = jnp.mean(probs_s, axis=0)
            total = _entropy(mean)
            aleatoric = jnp.mean(_entropy(probs_s), axis=0)
            return Prediction(mean, total, aleatoric, total - aleatoric)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ens_sh = jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    a, NamedSharding(mesh, P(sample_axis))), self.ensemble)
            self.ensemble = ens_sh
            rep = NamedSharding(mesh, P())
            ens_spec = jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P(sample_axis)), self.ensemble)
            self._predict = jax.jit(
                predict, in_shardings=(ens_spec, rep, rep),
                out_shardings=rep)
            self._predict_cf = jax.jit(
                predict_cf, in_shardings=(ens_spec, rep, rep, rep),
                out_shardings=rep)
            self._predict_lin = jax.jit(
                predict_lin, in_shardings=(rep, ens_spec, rep, rep),
                out_shardings=rep)
        else:
            self._predict = jax.jit(predict)
            self._predict_cf = jax.jit(predict_cf)
            self._predict_lin = jax.jit(predict_lin)

    def __call__(self, x) -> Prediction:
        return self._predict(self.ensemble, self.batch_stats, jnp.asarray(x))

    def predict_closed_form(self, x, method: str = "probit") -> Prediction:
        """Closed-form predictive from the ensemble's logit moments
        (probit mean-field or Laplace-bridge Dirichlet;
        eval/predictive.py). Reuses the resident ensemble — one extra
        jitted logit forward, no additional sampling. The uncertainty
        decomposition keeps the MC definitions (entropies of the
        closed-form mean; aleatoric from per-sample logits) — because the
        closed-form mean is not exactly the MC mean, the BALD difference
        can dip slightly below zero. Honors the predictor's compute_dtype
        and mesh configuration like ``__call__``."""
        if method not in ("probit", "bridge"):
            raise ValueError(f"unknown closed-form method {method!r}")
        return self._predict_cf(self.ensemble, self.batch_stats,
                                jnp.asarray(x),
                                jnp.asarray(method == "bridge"))

    def predict_linearized(self, x) -> Prediction:
        """GLM / linearized-Laplace predictive: the resident posterior
        samples pushed through the MAP-linearized network (one
        jax.linearize per call + vmapped jvps; Immer et al., 2021).
        Equals ``__call__`` exactly when the logits are linear in the
        parameters."""
        return self._predict_lin(self.mean_params, self.ensemble,
                                 self.batch_stats, jnp.asarray(x))
