"""Activation / output-gradient / parameter-gradient capture via one vjp.

Replaces the reference's hook + ``retain_graph`` inner loop
(reference: scripts/factors.py:48-61 — one forward per batch, then
``--samples`` Monte-Carlo label draws each doing a full ``backward``):

  * ONE forward pass captures every tracked layer's input and builds a vjp
    closure (the probes trick, see nn/core.py);
  * each MC label draw only changes the loss cotangent at the logits —
    ``(softmax(logits) - onehot(labels_s)) / B`` — so the S backward passes
    become a single ``jax.vmap`` of the vjp function over cotangent seeds.

Everything returned is a pytree; the whole capture is jit-compatible.
"""
import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import LayerMeta, Model, param_matrix


@dataclass
class Captured:
    """Per-batch capture results.

    acts:        layer-name -> layer input (shared across MC samples).
    probe_grads: layer-name -> [S, ...preact shape] dL/dy of the mean loss.
    param_grads: layer-name -> [S, out, fan_in(+1)] matrix-view grads of the
                 mean loss (bias column appended).
    logits:      [B, K] model outputs of the forward pass.
    batch_size:  B.
    probe_grams: layer-name -> [S, out, out] per-sample token Grams
                 ``sum_n g_n g_n^T`` for layers captured through the fused
                 gram-tap backward (see nn.core.gram_tap); such layers have
                 no ``probe_grads`` entry.
    probe_gram_ntok: layer-name -> token count N of each fused Gram
                 (static; the estimator's per-token normalization).
    """
    acts: Dict[str, jax.Array]
    probe_grads: Dict[str, jax.Array]
    param_grads: Dict[str, jax.Array]
    logits: jax.Array
    batch_size: int
    probe_grams: Optional[Dict[str, jax.Array]] = None
    probe_gram_ntok: Optional[Dict[str, int]] = None


jax.tree_util.register_pytree_node(
    Captured,
    lambda c: ((c.acts, c.probe_grads, c.param_grads, c.logits,
                c.probe_grams),
               (c.batch_size,
                None if c.probe_gram_ntok is None
                else tuple(sorted(c.probe_gram_ntok.items())))),
    lambda aux, kids: Captured(
        kids[0], kids[1], kids[2], kids[3], batch_size=aux[0],
        probe_grams=kids[4],
        probe_gram_ntok=None if aux[1] is None else dict(aux[1])),
)


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross-entropy from logits (the reference's criterion,
    scripts/factors.py:39). Rank-polymorphic: classification feeds
    ``[B, K]`` logits / ``[B]`` labels; a language model feeds ``[B, T, V]``
    / ``[B, T]`` and the mean runs over all B*T token positions."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))


def _ce_cotangent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """d(mean CE)/d logits = (softmax - onehot) / #positions.

    #positions is the product of every leading axis — B for ``[B, K]``
    classification, B*T for ``[B, T, V]`` per-token LM loss — so the
    classification path is bit-identical to the original /B form."""
    p = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=p.dtype)
    n_pos = math.prod(logits.shape[:-1])
    return (p - onehot) / n_pos


def gaussian_nll(preds: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean unit-variance Gaussian NLL (squared error), the exponential-family
    regression loss whose Fisher the estimators also cover."""
    return 0.5 * jnp.mean(jnp.sum((preds - targets) ** 2, axis=-1))


def _gaussian_cotangent(preds: jax.Array, targets: jax.Array) -> jax.Array:
    """d(mean 0.5||f-y||^2)/d f = (f - y) / B."""
    return (preds - targets) / preds.shape[0]


def sample_labels(rng: jax.Array, logits: jax.Array, num_samples: int,
                  loss: str = "cross_entropy") -> jax.Array:
    """Monte-Carlo targets from the model's output distribution (the 'true'
    Fisher; reference scripts/factors.py:52-55). Categorical draws [S, B]
    for classification, unit-variance Gaussian draws [S, B, K] for
    regression."""
    if loss == "gaussian":
        eps = jax.random.normal(rng, (num_samples,) + logits.shape,
                                logits.dtype)
        return logits[None] + eps
    # categorical over the last axis; any leading token axes ride along
    # (classification [S, B]; ``loss='lm'`` per-token draws [S, B, T])
    return jax.random.categorical(rng, logits[None],
                                  axis=-1,
                                  shape=(num_samples,) + logits.shape[:-1])


def collect(model: Model,
            metas: Dict[str, LayerMeta],
            variables: Dict,
            x: jax.Array,
            labels: Optional[jax.Array] = None,
            rng: Optional[jax.Array] = None,
            num_samples: int = 1,
            train: bool = True,
            need_param_grads: bool = True,
            need_probe_grads: bool = True,
            loss: str = "cross_entropy",
            remat: bool = False,
            label_sharding=None,
            gram_probe_names=frozenset()) -> Captured:
    """Capture (acts, probe grads, param grads) for all tracked layers.

    Args:
      labels: [S, B] integer labels per MC sample. If None, labels are drawn
        from Categorical(logits) with ``rng`` (true-Fisher mode); pass data
        labels of shape [1, B] for the empirical Fisher.
      need_param_grads / need_probe_grads: which cotangent outputs the
        caller's estimator consumes; disabling the unused one removes its
        backward computation entirely (KFAC needs only probe grads, the
        gradient-moment estimators only param grads).
      remat: rematerialize the forward during the backward passes
        (jax.checkpoint) — trades FLOPs for HBM on very deep models.
      label_sharding: optional sharding constraint for internally-drawn MC
        labels (2-D-mesh runs: shard the [S, B] label grid over
        (sample, data) so GSPMD fans the vmapped backward passes out over
        the sample axis instead of replicating them).
      gram_probe_names: layers whose output-gradient capture is FUSED:
        instead of a probe (whose [S, ...preact] cotangent becomes a vjp
        output materialized in HBM), the layer gets a gram-tap
        (nn.core.gram_tap) and the vjp directly returns the [out, out]
        token Gram per MC sample — all an estimator's G factor needs.
        Only meaningful with ``need_probe_grads``.
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    probes = model.zero_probes(variables, x, train=train)
    probes = {k: v for k, v in probes.items() if k in metas}
    tap_names = frozenset(gram_probe_names) & set(probes)
    ntok = {k: math.prod(probes[k].shape[:-1]) for k in sorted(tap_names)}
    taps = {k: jnp.zeros((probes[k].shape[-1],) * 2, jnp.float32)
            for k in sorted(tap_names)}
    if tap_names:
        probes = {k: v for k, v in probes.items() if k not in tap_names}

    def fwd(p, pr, tp):
        kw = {"gram_taps": tp} if tp else {}
        out, aux = model.apply({"params": p, "batch_stats": batch_stats},
                               x, train=train, capture=True, probes=pr,
                               **kw)
        acts = {k: v for k, v in aux["acts"].items() if k in metas}
        return out, acts

    if remat:
        fwd = jax.checkpoint(fwd)

    if need_param_grads and need_probe_grads:
        logits, f_vjp, acts = jax.vjp(
            lambda p, pr, tp: fwd(p, pr, tp), params, probes, taps,
            has_aux=True)
    elif need_probe_grads:
        logits, f_vjp, acts = jax.vjp(
            lambda pr, tp: fwd(params, pr, tp), probes, taps, has_aux=True)
    else:
        if tap_names:
            raise ValueError("gram_probe_names requires need_probe_grads")
        logits, f_vjp, acts = jax.vjp(
            lambda p: fwd(p, probes, {}), params, has_aux=True)

    if labels is None:
        if rng is None:
            raise ValueError("need rng when labels are not given")
        labels = sample_labels(rng, logits, num_samples, loss)
        if label_sharding is not None:
            labels = jax.lax.with_sharding_constraint(labels, label_sharding)
    labels = jnp.asarray(labels)
    # per-sample label rank: [B] classification, [B, D] gaussian targets,
    # [B, T] per-token LM labels (``loss='lm'`` — same categorical math as
    # cross_entropy, but the extra axis makes explicit [B, T] labels
    # distinguishable from MC-stacked [S, B])
    min_ndim = 2 if loss in ("gaussian", "lm") else 1
    if labels.ndim == min_ndim:
        labels = labels[None]

    cot_fn = _gaussian_cotangent if loss == "gaussian" else _ce_cotangent
    cotangents = jax.vmap(cot_fn, in_axes=(None, 0))(logits, labels)

    def backward(cot):
        if need_param_grads and need_probe_grads:
            grads_params, grads_probes, grads_taps = f_vjp(cot)
        elif need_probe_grads:
            grads_probes, grads_taps = f_vjp(cot)
            grads_params = None
        else:
            (grads_params,) = f_vjp(cot)
            grads_probes, grads_taps = {}, {}
        grads_mats = {} if grads_params is None else {
            name: param_matrix(metas[name], grads_params[name])
            for name in metas
        }
        return grads_mats, grads_probes, grads_taps

    param_grads, probe_grads, probe_grams = jax.vmap(backward)(cotangents)
    # observation count: B for classification/regression, B*T for the
    # per-token LM Fisher (loss='lm') — the cotangent is normalized by the
    # number of label positions, so the Fisher scale must use the same
    # count or every estimator's factors come out 1/T (diag) or 1/T^2
    # (KFAC G) of the per-token convention used everywhere else.
    n_obs = math.prod(logits.shape[:-1]) if loss == "lm" else x.shape[0]
    return Captured(acts=acts, probe_grads=probe_grads,
                    param_grads=param_grads, logits=logits,
                    batch_size=n_obs,
                    probe_grams=probe_grams if tap_names else None,
                    probe_gram_ntok=ntok if tap_names else None)
