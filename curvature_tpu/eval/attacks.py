"""Adversarial evaluation: the Fast Gradient Sign Method.

Parity with the reference's fgsm (curvature/datasets.py:29-64) and the
FGSM evaluation loops (scripts/evaluate.py:19-91). The Bayesian variant
vmaps attack + prediction over the posterior ensemble: the reference's
30x {sample_and_replace, attack, eval} loop is one batched program.
"""
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.eval import metrics
from curvature_tpu.estimators.capture import softmax_cross_entropy


def make_fgsm_fn(model):
    """Jitted FGSM perturbation: x + eps * sign(dL/dx), clamped to the
    batch's value range (datasets.py:51-62)."""
    @jax.jit
    def attack(variables, x, labels, epsilon):
        vmin = jnp.min(x)
        vmax = jnp.max(x)

        def loss_fn(xx):
            logits, _ = model.apply(variables, xx, train=False)
            return softmax_cross_entropy(logits, labels)

        grad = jax.grad(loss_fn)(x)
        return jnp.clip(x + epsilon * jnp.sign(grad), vmin, vmax)
    return attack


def fgsm(model, variables, x, labels, epsilon: float = 0.1):
    return make_fgsm_fn(model)(variables, jnp.asarray(x),
                               jnp.asarray(labels), epsilon)


def _stats_dict(predictions, labels, epsilon) -> Dict:
    return {
        "eps": float(epsilon),
        "acc": float(metrics.accuracy(predictions, labels)),
        "ece1": float(100 * metrics.expected_calibration_error(
            predictions, labels)[0]),
        "ece2": float(100 * metrics.calibration_curve(predictions, labels)[0]),
        "nll": float(metrics.negative_log_likelihood(predictions, labels)),
        "ent": float(metrics.predictive_entropy(predictions, mean=True)),
    }


def eval_fgsm(model, variables, data, epsilon: float = 0.1,
              stats: bool = True) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Deterministic adversarial eval (reference eval_fgsm, evaluate.py:19-57)."""
    attack = make_fgsm_fn(model)

    @jax.jit
    def adv_probs(variables, x, labels, eps):
        adv = attack(variables, x, labels, eps)
        logits, _ = model.apply(variables, adv, train=False)
        return jax.nn.softmax(logits, axis=-1)

    probs_list, labels_list = [], []
    for x, y in data:
        probs_list.append(np.asarray(
            adv_probs(variables, jnp.asarray(x), jnp.asarray(y), epsilon)))
        labels_list.append(np.asarray(y))
    predictions = np.concatenate(probs_list)
    labels = np.concatenate(labels_list)
    return predictions, labels, (_stats_dict(predictions, labels, epsilon)
                                 if stats else None)


def eval_fgsm_bnn(model, variables, estimator, data, samples: int = 30,
                  epsilon: float = 0.1, rng: Optional[jax.Array] = None,
                  stats: bool = True, ensemble_params=None,
                  ) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Bayesian adversarial eval (reference eval_fgsm_bnn, evaluate.py:60-91):
    each posterior sample attacks and predicts with its own weights; the
    sample axis is vmapped."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if ensemble_params is None:
        ensemble_params = estimator.ensemble_params(rng, samples)
    batch_stats = variables.get("batch_stats", {})
    attack = make_fgsm_fn(model)

    @jax.jit
    def mean_adv_probs(ensemble, x, labels, eps):
        def one(p):
            v = {"params": p, "batch_stats": batch_stats}
            adv = attack(v, x, labels, eps)
            logits, _ = model.apply(v, adv, train=False)
            return jax.nn.softmax(logits, axis=-1)
        return jnp.mean(jax.vmap(one)(ensemble), axis=0)

    probs_list, labels_list = [], []
    for x, y in data:
        probs_list.append(np.asarray(
            mean_adv_probs(ensemble_params, jnp.asarray(x), jnp.asarray(y),
                           epsilon)))
        labels_list.append(np.asarray(y))
    predictions = np.concatenate(probs_list)
    labels = np.concatenate(labels_list)
    return predictions, labels, (_stats_dict(predictions, labels, epsilon)
                                 if stats else None)
