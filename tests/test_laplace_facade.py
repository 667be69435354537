"""High-level Laplace facade (curvature_tpu/laplace.py): fit -> tune ->
predict across all estimators; delegation equals the low-level calls."""
import numpy as np
import pytest

import jax

from curvature_tpu import estimators, laplace, models


@pytest.fixture(scope="module")
def setup():
    model = models.mlp([7], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (32, 5))
    variables = model.init(rng, x)
    data = [(np.asarray(x[:16]), np.zeros(16, np.int32)),
            (np.asarray(x[16:]), np.zeros(16, np.int32))]
    return model, variables, x, data


@pytest.mark.parametrize("est", ["diag", "kfac", "block", "efb", "inf"])
def test_fit_tune_predict(setup, est):
    model, variables, x, data = setup
    la = laplace.fit(model, variables, data, estimator=est, mc_samples=2,
                     rng=jax.random.PRNGKey(0), rank=10)
    res = la.optimize_prior_precision(steps=30)
    assert np.isfinite(res["log_marglik"])
    # tuned values are retained and reused by the evidence query
    np.testing.assert_allclose(la.log_marginal_likelihood(),
                               res["log_marglik"], rtol=1e-4)
    for method in ("sampled", "probit", "linearized"):
        probs = la.predictive(x[:8], method=method, samples=4)
        assert probs.shape == (8, 4)
        np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)


def test_marglik_consistent_with_pre_scale(setup):
    """The tuned evidence and the default-argument evidence agree when
    pre_scale != 1 (the tuner optimizes at multiply = pre_scale * scale)."""
    model, variables, x, data = setup
    la = laplace.fit(model, variables, data, estimator="kfac", mc_samples=2,
                     rng=jax.random.PRNGKey(0), pre_scale=32)
    res = la.optimize_prior_precision(steps=30)
    np.testing.assert_allclose(la.log_marginal_likelihood(),
                               res["log_marglik"], rtol=1e-4)


def test_predictive_cache_invalidates_on_reinvert(setup):
    """Repeated predictive() calls reuse the jitted forward + ensemble;
    re-tuning the damping redraws the ensemble (stale-cache guard)."""
    model, variables, x, data = setup
    la = laplace.fit(model, variables, data, estimator="kfac", mc_samples=2,
                     rng=jax.random.PRNGKey(0))
    la.optimize_prior_precision(steps=30)
    a = la.predictive(x[:6], samples=4)
    a2 = la.predictive(x[:6], samples=4)
    np.testing.assert_array_equal(a, a2)          # cached ensemble reused
    la.estimator.invert(1e4, 1.0)                 # very different damping
    b = la.predictive(x[:6], samples=4)
    assert not np.allclose(a, b)                  # cache was invalidated


def test_fit_matches_lowlevel(setup):
    """fit() is exactly the estimator lifecycle: same rng -> same factors."""
    model, variables, x, data = setup
    la = laplace.fit(model, variables, data, estimator="kfac", mc_samples=2,
                     rng=jax.random.PRNGKey(7))
    est = estimators.KFAC(model, variables)
    key = jax.random.PRNGKey(7)
    for xb, _ in data:
        key, k = jax.random.split(key)
        est.update(xb, rng=k, num_samples=2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        la.estimator.state, est.state)


def test_subset_and_per_layer(setup):
    model, variables, x, data = setup
    la = laplace.fit(model, variables, data, estimator="kfac",
                     subset="last", mc_samples=2, rng=jax.random.PRNGKey(0))
    assert list(la.estimator.metas) == ["fc2"]
    res = la.optimize_prior_precision(per_layer=True, steps=40)
    assert len(res["norms"]) == 1
    probs = la(x[:4])                      # __call__ = predictive
    assert probs.shape == (4, 4)


def test_facade_errors(setup):
    model, variables, x, data = setup
    la = laplace.fit(model, variables, data, estimator="kfac", mc_samples=1,
                     rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="invert first"):
        la.predictive(x[:4])
    with pytest.raises(ValueError, match="optimize_prior_precision"):
        la.log_marginal_likelihood()
    with pytest.raises(ValueError, match="only method='marglik'"):
        la.optimize_prior_precision(method="gp")
    with pytest.raises(ValueError, match="unknown estimator"):
        laplace.fit(model, variables, data, estimator="hessian")
    la.optimize_prior_precision(steps=20)
    with pytest.raises(ValueError, match="unknown predictive"):
        la.predictive(x[:4], method="exact")
