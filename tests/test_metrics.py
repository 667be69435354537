"""Metric parity vs the reference's utils.py on random predictions."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
from curvature import utils as ref_utils  # noqa: E402

from curvature_tpu.eval import metrics  # noqa: E402


@pytest.fixture(scope="module")
def preds():
    rng = np.random.default_rng(7)
    logits = rng.standard_normal((500, 10)).astype(np.float64)
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, 10, size=500)
    return p.astype(np.float32), labels


def test_accuracy(preds):
    p, y = preds
    assert float(metrics.accuracy(p, y)) == pytest.approx(
        ref_utils.accuracy(p, y), abs=1e-5)


def test_confidence(preds):
    p, _ = preds
    assert float(metrics.confidence(p)) == pytest.approx(
        ref_utils.confidence(p), abs=1e-6)
    np.testing.assert_allclose(np.asarray(metrics.confidence(p, mean=False)),
                               ref_utils.confidence(p, mean=False), rtol=1e-6)


def test_nll(preds):
    p, y = preds
    assert float(metrics.negative_log_likelihood(p, y)) == pytest.approx(
        ref_utils.negative_log_likelihood(p, y), rel=1e-5)


def test_predictive_entropy(preds):
    p, _ = preds
    np.testing.assert_allclose(np.asarray(metrics.predictive_entropy(p)),
                               ref_utils.predictive_entropy(p),
                               rtol=1e-4, atol=1e-6)
    assert float(metrics.predictive_entropy(p, mean=True)) == pytest.approx(
        float(ref_utils.predictive_entropy(p, mean=True)), rel=1e-4)


def test_expected_calibration_error(preds):
    p, y = preds
    ours = metrics.expected_calibration_error(p, y)
    theirs = ref_utils.expected_calibration_error(p, y)
    assert float(ours[0]) == pytest.approx(theirs[0], abs=1e-6)
    for a, b in zip(ours[1:], theirs[1:]):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=1e-6)


def test_calibration_curve(preds):
    p, y = preds
    ours = metrics.calibration_curve(p, y)
    theirs = ref_utils.calibration_curve(p, y)
    assert ours[0] == pytest.approx(theirs[0], abs=1e-6)
    for a, b in zip(ours[1:], theirs[1:]):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_binned_kl_distance(preds):
    rng = np.random.default_rng(3)
    d1 = np.abs(rng.standard_normal(300))
    d2 = np.abs(rng.standard_normal(300)) * 1.5
    assert metrics.binned_kl_distance(d1, d2) == pytest.approx(
        ref_utils.binned_kl_distance(d1, d2), rel=1e-6)


def test_linear_interpolation(preds):
    rng = np.random.default_rng(4)
    d = rng.standard_normal(50)
    np.testing.assert_allclose(metrics.linear_interpolation(-1.0, 2.0, d),
                               ref_utils.linear_interpolation(-1.0, 2.0, d),
                               rtol=1e-6)


def test_get_eigenvalues_kron_property():
    """KFAC entries: outer product of per-factor eigenvalues equals the
    eigenvalues of the Kronecker product (reference utils.py:21-42)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    a = rng.standard_normal((4, 4)).astype(np.float32)
    a = a @ a.T
    g = rng.standard_normal((3, 3)).astype(np.float32)
    g = g @ g.T
    state = {"layer": {"a": jnp.asarray(a), "g": jnp.asarray(g)},
             "diag_layer": jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))}
    ev = np.sort(np.asarray(metrics.get_eigenvalues(state)))[::-1]
    dense = np.sort(np.linalg.eigvalsh(np.kron(a, g)))[::-1]
    flat = np.asarray(state["diag_layer"]).ravel()
    expected = np.sort(np.concatenate([dense, flat]))[::-1]
    np.testing.assert_allclose(ev, expected, rtol=1e-4, atol=1e-5)


def test_auroc_against_sklearn():
    """Rank-based AUROC (incl. midrank tie handling) matches sklearn."""
    from sklearn.metrics import roc_auc_score
    from curvature_tpu.eval.metrics import auroc
    rng = np.random.default_rng(0)
    neg = rng.standard_normal(300)
    pos = rng.standard_normal(200) + 0.8
    got = auroc(neg, pos)
    want = roc_auc_score(np.r_[np.zeros(300), np.ones(200)],
                         np.r_[neg, pos])
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # ties: quantized scores exercise the midrank path
    negq, posq = np.round(neg), np.round(pos)
    np.testing.assert_allclose(
        auroc(negq, posq),
        roc_auc_score(np.r_[np.zeros(300), np.ones(200)], np.r_[negq, posq]),
        rtol=1e-12)
    assert auroc([0.0, 1.0], [0.0, 1.0]) == 0.5


def test_get_eigenvalues_blocked_factors():
    """Grouped/split factor states: eigenvalues are the per-BLOCK outer
    products — no cross-block pairs (which are not eigenvalues of the
    block-diagonal curvature)."""
    from curvature_tpu.eval.metrics import get_eigenvalues
    rng = np.random.default_rng(0)

    def spd(n):
        a = rng.standard_normal((n, n))
        return (a @ a.T + n * np.eye(n)).astype(np.float32)

    # grouped: a [g, c, c], g [g, o, o]
    g, c, o = 3, 4, 2
    a = np.stack([spd(c) for _ in range(g)])
    gg = np.stack([spd(o) for _ in range(g)])
    state = {"conv": {"a": a, "g": gg}}
    got = np.sort(np.asarray(get_eigenvalues(state)))
    want = np.sort(np.concatenate([
        np.outer(np.linalg.eigvalsh(a[k]), np.linalg.eigvalsh(gg[k])).ravel()
        for k in range(g)]))
    assert got.size == g * c * o
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # shared A, split G blocks (qkv-style): a [c, c], g [3, e, e]
    e = 3
    a1 = spd(c)
    g3 = np.stack([spd(e) for _ in range(3)])
    got = np.sort(np.asarray(get_eigenvalues({"attn": {"a": a1, "g": g3}})))
    want = np.sort(np.concatenate([
        np.outer(np.linalg.eigvalsh(a1), np.linalg.eigvalsh(g3[k])).ravel()
        for k in range(3)]))
    assert got.size == 3 * c * e
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # head-split out_proj: a [H, d, d] + scalar bias block, shared g
    h, d = 2, 3
    ah = np.stack([spd(d) for _ in range(h)])
    gsh = spd(o)
    state = {"out": {"a": ah, "g": gsh, "a_bias": np.float32(1.7)}}
    got = np.sort(np.asarray(get_eigenvalues(state)))
    want = [np.outer(np.linalg.eigvalsh(ah[k]),
                     np.linalg.eigvalsh(gsh)).ravel() for k in range(h)]
    want.append(1.7 * np.linalg.eigvalsh(gsh))
    want = np.sort(np.concatenate(want))
    assert got.size == h * d * o + o
    np.testing.assert_allclose(got, want, rtol=1e-4)
