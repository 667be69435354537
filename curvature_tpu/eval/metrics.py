"""Calibration / uncertainty metrics.

Behavioral parity with the reference metric suite (curvature/utils.py:63-267):
``accuracy``, ``confidence``, ``negative_log_likelihood``,
``predictive_entropy``, equal-width ECE (``expected_calibration_error``,
utils.py:207-247), equal-count ECE (``calibration_curve``, utils.py:155-204),
histogram JSD (``binned_kl_distance``, utils.py:93-122) and KFAC eigenvalue
collection (``get_eigenvalues``, utils.py:21-42).

Scalar metrics are pure jnp and jit-friendly (fixed-size bin outputs with
zeros for empty bins, exactly like the reference's list building), so the
hyperopt objective can stay on device. Plot-facing helpers return numpy.
"""
from typing import Dict, Union

import numpy as np
import jax
import jax.numpy as jnp


Array = Union[np.ndarray, jax.Array]


def accuracy(probabilities: Array, labels: Array) -> jax.Array:
    """Top-1 accuracy in percent (utils.py:79-90)."""
    probabilities = jnp.asarray(probabilities)
    labels = jnp.asarray(labels)
    return 100.0 * jnp.mean(
        (jnp.argmax(probabilities, axis=1) == labels).astype(jnp.float32))


def confidence(probabilities: Array, mean: bool = True):
    """Max predicted probability (utils.py:125-138)."""
    conf = jnp.max(jnp.asarray(probabilities), axis=1)
    return jnp.mean(conf) if mean else conf


def negative_log_likelihood(probabilities: Array, labels: Array) -> jax.Array:
    """NLL of the predicted class probabilities (utils.py:141-152)."""
    probabilities = jnp.asarray(probabilities)
    labels = jnp.asarray(labels)
    picked = jnp.take_along_axis(probabilities, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(jnp.log(picked + 1e-12))


def predictive_entropy(probabilities: Array, mean: bool = False):
    """Row-wise Shannon entropy, rows renormalized like scipy.stats.entropy
    (utils.py:250-267)."""
    p = jnp.asarray(probabilities)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=1)
    return jnp.mean(ent) if mean else ent


def expected_calibration_error(probabilities: Array, labels: Array,
                               bins: int = 10):
    """Equal-width-bin ECE (utils.py:207-247).

    Returns (ece, bin_ace, bin_accuracy, bin_confidence); empty bins
    contribute zeros, matching the reference's list building.
    """
    probabilities = jnp.asarray(probabilities)
    labels = jnp.asarray(labels)
    conf = jnp.max(probabilities, axis=1)
    correct = (jnp.argmax(probabilities, axis=1) == labels).astype(jnp.float32)
    return ece_from_confidence(conf, correct, bins)


def ece_from_confidence(conf: Array, correct: Array, bins: int = 10):
    """Equal-width-bin ECE from per-sample (confidence, correctness) —
    the sufficient statistics. Identical binning to
    :func:`expected_calibration_error` (which delegates here); used
    directly by the vocab-scale LM eval path, where the full [N, 50257]
    probability matrix never leaves the device."""
    conf = jnp.asarray(conf)
    correct = jnp.asarray(correct, jnp.float32)
    edges = jnp.linspace(0.0, 1.0, bins + 1)
    lower = edges[:-1][:, None]
    upper = edges[1:][:, None]
    mask = (conf[None, :] > lower) & (conf[None, :] <= upper)   # [bins, N]
    count = jnp.sum(mask, axis=1)
    nonempty = count > 0
    safe = jnp.maximum(count, 1)
    bin_acc = jnp.where(nonempty, jnp.sum(mask * correct[None, :], axis=1) / safe, 0.0)
    bin_conf = jnp.where(nonempty, jnp.sum(mask * conf[None, :], axis=1) / safe, 0.0)
    ace = jnp.where(nonempty, bin_conf - bin_acc, 0.0)
    prop = count / conf.shape[0]
    ece = jnp.sum(prop * jnp.abs(ace))
    return ece, ace, bin_acc, bin_conf


def calibration_curve(probabilities: Array, labels: Array, bins: int = 20):
    """Equal-count-bin ECE (utils.py:155-204).

    Bin edges are every ``step``-th sorted confidence (plus the max), strict
    inequalities on both sides like the reference. Returns
    (ece, avg_confidence, accuracy, proportion) over *non-empty* bins
    (numpy, host-side — this feeds plots).
    """
    probabilities = np.asarray(probabilities)
    labels = np.asarray(labels)
    conf = np.max(probabilities, axis=1)
    n = conf.shape[0]
    step = (n + bins - 1) // bins
    edges = np.sort(conf)[::step]
    if n % step != 1:
        edges = np.concatenate([edges, [np.max(conf)]])
    correct = np.argmax(probabilities, axis=1) == labels

    xs, ys, zs = [], [], []
    ece = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (conf > lo) & (conf < hi)
        prop = in_bin.mean()
        if prop > 0:
            acc_in = correct[in_bin].mean()
            conf_in = conf[in_bin].mean()
            ece += np.abs(conf_in - acc_in) * prop
            xs.append(conf_in)
            ys.append(acc_in)
            zs.append(prop)
    return float(ece), np.array(xs), np.array(ys), np.array(zs)


def binned_kl_distance(dist1: Array, dist2: Array, smooth: float = 1e-7,
                       bins: np.ndarray = None) -> float:
    """Symmetric discrete KL (JSD) between two samples (utils.py:93-122)."""
    if bins is None:
        bins = np.logspace(-7, 1, num=200)
    p1, _ = np.histogram(np.asarray(dist1), bins)
    p2, _ = np.histogram(np.asarray(dist2), bins)
    p1 = (p1 + smooth) / (p1 + smooth).sum()
    p2 = (p2 + smooth) / (p2 + smooth).sum()
    return float(np.sum(p1 * np.log(p1 / p2)) + np.sum(p2 * np.log(p2 / p1)))


def linear_interpolation(min_val: float, max_val: float,
                         data: np.ndarray) -> np.ndarray:
    """Rescale ``data`` linearly into [min_val, max_val] (utils.py:63-76)."""
    data = np.asarray(data)
    return ((max_val - min_val) * (data - np.min(data))
            / (np.max(data) - np.min(data)) + min_val)


def rmse(mean: Array, targets: Array) -> float:
    """Root-mean-square error over all outputs (regression)."""
    d = np.asarray(mean, np.float64) - np.asarray(targets, np.float64)
    return float(np.sqrt(np.mean(d * d)))


def gaussian_nll(mean: Array, var: Array, targets: Array) -> float:
    """Mean heteroscedastic Gaussian NLL (natural log; regression
    counterpart of :func:`negative_log_likelihood`)."""
    m = np.asarray(mean, np.float64)
    v = np.asarray(var, np.float64)
    y = np.asarray(targets, np.float64)
    return float(np.mean(0.5 * (np.log(2 * np.pi * v) + (y - m) ** 2 / v)))


def auroc(scores_negative: Array, scores_positive: Array) -> float:
    """Area under the ROC curve via the rank (Mann-Whitney U) statistic:
    P(score_positive > score_negative) + 0.5 * P(tie). Used for OOD
    detection with predictive entropy as the score (positive = OOD) —
    extension beyond the reference, which only plots ECDF panels
    (scripts/visualize.py:148-208)."""
    neg = np.asarray(scores_negative, np.float64).ravel()
    pos = np.asarray(scores_positive, np.float64).ravel()
    both = np.concatenate([neg, pos])
    order = np.argsort(both, kind="mergesort")
    ranks = np.empty_like(both)
    ranks[order] = np.arange(1, both.size + 1, dtype=np.float64)
    # average ranks over ties (midrank), else ties bias the U statistic
    uniq, inv, cnt = np.unique(both, return_inverse=True,
                               return_counts=True)
    if (cnt > 1).any():
        sums = np.zeros(uniq.size)
        np.add.at(sums, inv, ranks)
        ranks = (sums / cnt)[inv]
    u = ranks[neg.size:].sum() - pos.size * (pos.size + 1) / 2.0
    return float(u / (neg.size * pos.size))


def get_eigenvalues(state: Dict) -> jax.Array:
    """All factor eigenvalues, concatenated over layers (utils.py:21-42).

    KFAC layers contribute the outer product of per-factor eigenvalues;
    diagonal-style layers contribute their flattened entries.
    """
    pieces = []
    for value in state.values():
        if isinstance(value, dict) and "a" in value and "g" in value:
            wa = jnp.linalg.eigvalsh(value["a"])           # [..., c]
            wg = jnp.linalg.eigvalsh(value["g"])           # [..., o]
            # per-BLOCK outer products: grouped/stacked/split factors carry
            # leading block axes — a flat jnp.outer would emit spurious
            # cross-block eigenvalue pairs (lambda_a(block i) *
            # lambda_g(block j) is not an eigenvalue of the block-diagonal
            # curvature). A-side leading dims are always a prefix of the
            # G-side's (shared A across split-G blocks) or vice versa.
            if wa.ndim < wg.ndim:
                wa = wa.reshape(wa.shape[:-1]
                                + (1,) * (wg.ndim - wa.ndim) + wa.shape[-1:])
            elif wg.ndim < wa.ndim:
                wg = wg.reshape(wg.shape[:-1]
                                + (1,) * (wa.ndim - wg.ndim) + wg.shape[-1:])
            pieces.append(
                (wa[..., :, None] * wg[..., None, :]).reshape(-1))
            if "a_bias" in value:
                # head-split out_proj scalar bias block: a_bias (x) G
                wb = jnp.asarray(value["a_bias"])[..., None]
                pieces.append((wb * jnp.linalg.eigvalsh(value["g"])
                               ).reshape(-1))
        else:
            arr = value if not isinstance(value, dict) else value.get("lam")
            pieces.append(jnp.asarray(arr).reshape(-1))
    return jnp.concatenate(pieces)
