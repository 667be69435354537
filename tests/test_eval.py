"""Evaluation engine tests: deterministic/Bayesian eval and FGSM."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.eval import (eval_bnn, eval_fgsm, eval_fgsm_bnn, eval_nn,
                                eval_nn_and_bnn, fgsm)


@pytest.fixture(scope="module")
def fitted():
    model = models.mlp([12], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (32, 6))
    variables = model.init(rng, x)
    est = estimators.KFAC(model, variables)
    est.update(x, rng=jax.random.PRNGKey(1), num_samples=2)
    est.invert(add=1.0, multiply=10.0)
    data_rng = np.random.default_rng(0)
    batches = [
        (data_rng.standard_normal((16, 6)).astype(np.float32),
         data_rng.integers(0, 4, 16).astype(np.int32))
        for _ in range(3)
    ]
    return model, variables, est, batches


def test_eval_nn(fitted):
    model, variables, _, batches = fitted
    probs, labels = eval_nn(model, variables, batches)
    assert probs.shape == (48, 4)
    assert labels.shape == (48,)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)


def test_eval_bnn_matches_manual_ensemble(fitted):
    """The vmapped ensemble eval equals averaging explicit per-sample
    forwards (the reference's loop semantics, evaluate.py:134-147)."""
    model, variables, est, batches = fitted
    rng = jax.random.PRNGKey(5)
    samples = 4
    mean_preds, labels, _ = eval_bnn(model, variables, est, batches,
                                     samples=samples, rng=rng)

    ensemble = est.ensemble_params(rng, samples)
    manual = 0
    for s in range(samples):
        p_s = jax.tree_util.tree_map(lambda a: a[s], ensemble)
        probs, _ = eval_nn(model, {"params": p_s, "batch_stats": {}}, batches)
        manual = manual + probs
    manual /= samples
    np.testing.assert_allclose(mean_preds, manual, rtol=1e-4, atol=1e-6)


def test_eval_bnn_stats(fitted):
    model, variables, est, batches = fitted
    _, _, stats = eval_bnn(model, variables, est, batches, samples=3,
                           rng=jax.random.PRNGKey(2), stats=True)
    assert len(stats["acc"]) == 3
    assert len(stats["nll"]) == 3
    assert all(np.isfinite(v) for v in stats["acc"])


def test_eval_nn_and_bnn(fitted):
    model, variables, est, batches = fitted
    preds, bnn_preds, labels, _ = eval_nn_and_bnn(
        model, variables, est, batches, samples=2, rng=jax.random.PRNGKey(3))
    assert preds.shape == bnn_preds.shape == (48, 4)


def test_fgsm_perturbation(fitted):
    model, variables, _, batches = fitted
    x, y = batches[0]
    adv = np.asarray(fgsm(model, variables, x, y, epsilon=0.1))
    assert adv.shape == x.shape
    delta = np.abs(adv - x)
    # inside the clamp region the perturbation magnitude is exactly epsilon
    assert delta.max() <= 0.1 + 1e-6
    assert adv.min() >= x.min() - 1e-6 and adv.max() <= x.max() + 1e-6
    # epsilon=0 leaves inputs unchanged
    adv0 = np.asarray(fgsm(model, variables, x, y, epsilon=0.0))
    np.testing.assert_allclose(adv0, x, atol=1e-7)


def test_eval_fgsm(fitted):
    model, variables, est, batches = fitted
    preds, labels, stats = eval_fgsm(model, variables, batches, epsilon=0.05)
    assert set(stats) == {"eps", "acc", "ece1", "ece2", "nll", "ent"}
    assert np.isfinite(stats["acc"])

    bpreds, _, bstats = eval_fgsm_bnn(model, variables, est, batches,
                                      samples=2, epsilon=0.05,
                                      rng=jax.random.PRNGKey(4))
    assert bpreds.shape == preds.shape
    assert np.isfinite(bstats["acc"])


def test_eval_bnn_chunked_matches_full(fitted):
    """Sample-chunked eval draws the same per-chunk rng streams, so it is
    validated statistically: mean predictions within MC tolerance and exact
    shape/normalization invariants."""
    model, variables, est, batches = fitted
    rng = jax.random.PRNGKey(9)
    full, labels, _ = eval_bnn(model, variables, est, batches, samples=8,
                               rng=rng)
    chunked, labels2, stats = eval_bnn(model, variables, est, batches,
                                       samples=8, rng=rng, sample_chunk=3,
                                       stats=True)
    np.testing.assert_array_equal(labels, labels2)
    np.testing.assert_allclose(chunked.sum(1), 1.0, rtol=1e-5)
    assert len(stats["acc"]) == 8
    # both are 8-sample posterior means of the same posterior
    assert np.abs(full - chunked).mean() < 0.2


def test_bayesian_predictor_uncertainty(fitted):
    from curvature_tpu.eval import BayesianPredictor
    model, variables, est, batches = fitted
    pred = BayesianPredictor(model, variables, est, samples=8,
                             rng=jax.random.PRNGKey(0))
    x, _ = batches[0]
    out = pred(x)
    assert out.mean.shape == (16, 4)
    np.testing.assert_allclose(np.asarray(out.mean).sum(1), 1.0, rtol=1e-5)
    # decomposition identities: total = aleatoric + epistemic, epistemic >= 0
    np.testing.assert_allclose(np.asarray(out.entropy),
                               np.asarray(out.aleatoric + out.epistemic),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.min(out.epistemic)) >= -1e-5


def test_bayesian_predictor_sharded(fitted):
    from curvature_tpu import parallel
    from curvature_tpu.eval import BayesianPredictor
    model, variables, est, batches = fitted
    mesh = parallel.make_mesh({"sample": 8})
    pred = BayesianPredictor(model, variables, est, samples=8,
                             rng=jax.random.PRNGKey(0), mesh=mesh)
    plain = BayesianPredictor(model, variables, est, samples=8,
                              rng=jax.random.PRNGKey(0))
    x, _ = batches[0]
    with mesh:
        out = pred(x)
    out2 = plain(x)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(out2.mean),
                               rtol=1e-5, atol=1e-6)


def test_bayesian_predictor_bf16(fitted):
    from curvature_tpu.eval import BayesianPredictor
    model, variables, est, batches = fitted
    f32 = BayesianPredictor(model, variables, est, samples=6,
                            rng=jax.random.PRNGKey(0))
    bf16 = BayesianPredictor(model, variables, est, samples=6,
                             rng=jax.random.PRNGKey(0),
                             compute_dtype=jnp.bfloat16)
    x, _ = batches[0]
    a = np.asarray(f32(x).mean)
    b = np.asarray(bf16(x).mean)
    assert b.dtype == np.float32          # probabilities stay f32
    np.testing.assert_allclose(a, b, atol=0.05)   # bf16 forward tolerance


def test_eval_bf16_compute_dtype(fitted):
    """bf16 eval forwards stay close to f32 (softmax/metrics are f32; the
    forward runs in the MXU's native dtype) and probabilities normalize."""
    model, variables, est, batches = fitted
    f32, labels = eval_nn(model, variables, batches)
    b16, _ = eval_nn(model, variables, batches, compute_dtype=jnp.bfloat16)
    assert b16.dtype == np.float32
    np.testing.assert_allclose(b16.sum(1), 1.0, rtol=1e-3)
    np.testing.assert_allclose(b16, f32, atol=0.05)

    rng = jax.random.PRNGKey(5)
    m32, _, _ = eval_bnn(model, variables, est, batches, samples=4, rng=rng)
    m16, _, _ = eval_bnn(model, variables, est, batches, samples=4, rng=rng,
                         compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(m16, m32, atol=0.05)
    # chunked path honors the dtype too
    c16, _, _ = eval_bnn(model, variables, est, batches, samples=4, rng=rng,
                         sample_chunk=2, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(c16.sum(1), 1.0, rtol=1e-3)


def test_closed_form_predictives(fitted):
    """Probit mean-field and Laplace bridge: reduce to softmax(mu) at zero
    variance, shrink confidence as variance grows, normalize, and run
    end-to-end from the sampled logit ensemble."""
    from curvature_tpu.eval import (eval_bnn_closed_form, laplace_bridge,
                                    probit_mean_field)
    model, variables, est, batches = fitted
    mu = jnp.asarray([[2.0, -1.0, 0.5, 0.0]])
    zero = jnp.zeros_like(mu)

    p0 = probit_mean_field(mu, zero)
    np.testing.assert_allclose(np.asarray(p0),
                               np.asarray(jax.nn.softmax(mu)), rtol=1e-6)
    p1 = probit_mean_field(mu, 10.0 * jnp.ones_like(mu))
    assert float(p1.max()) < float(p0.max())      # variance shrinks conf

    alpha, mean = laplace_bridge(mu, 0.5 * jnp.ones_like(mu))
    assert np.all(np.asarray(alpha) > 0)
    np.testing.assert_allclose(np.asarray(mean).sum(-1), 1.0, rtol=1e-5)
    assert int(np.argmax(np.asarray(mean))) == 0  # order preserved

    for method in ("probit", "bridge"):
        preds, labels = eval_bnn_closed_form(
            model, variables, est, batches, samples=4,
            rng=jax.random.PRNGKey(5), method=method)
        assert preds.shape == (48, 4)
        np.testing.assert_allclose(preds.sum(1), 1.0, rtol=1e-4)


def test_predictor_closed_form(fitted):
    """Closed-form serving predictives: valid distributions, same winning
    class structure as MC at small variance, both methods jit-cached."""
    from curvature_tpu.eval import BayesianPredictor
    model, variables, est, batches = fitted
    pred = BayesianPredictor(model, variables, est, samples=8,
                             rng=jax.random.PRNGKey(0))
    x = batches[0][0]
    mc = pred(x)
    for method in ("probit", "bridge"):
        cf = pred.predict_closed_form(x, method=method)
        assert cf.mean.shape == mc.mean.shape
        np.testing.assert_allclose(np.asarray(cf.mean).sum(-1), 1.0,
                                   rtol=1e-4)
        assert bool(jnp.all(jnp.isfinite(cf.entropy)))
        # closed-form mean != MC mean, so BALD may dip slightly negative
        assert bool(jnp.all(cf.epistemic >= -0.1))
    with pytest.raises(ValueError):
        pred.predict_closed_form(x, method="nope")


def test_linearized_predictive_exact_for_linear_model():
    """GLM predictive (eval_bnn_linearized): for a model whose logits are
    LINEAR in the parameters, f_lin == f exactly, so the linearized MC
    predictive must equal the sampled-weight MC predictive bit-for-bit
    (same rng -> same ensemble)."""
    from curvature_tpu.eval import eval_bnn_linearized
    model = models.mlp([], 4)          # single dense layer: logits = xW + b
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (32, 6))
    variables = model.init(rng, x)
    est = estimators.KFAC(model, variables)
    est.update(x, rng=jax.random.PRNGKey(1), num_samples=2)
    est.invert(add=1.0, multiply=10.0)
    batches = [(np.asarray(x[:16]), np.zeros(16, np.int32)),
               (np.asarray(x[16:]), np.zeros(16, np.int32))]
    r = jax.random.PRNGKey(7)
    mc, labels, _ = eval_bnn(model, variables, est, batches, samples=6, rng=r)
    lin, labels2 = eval_bnn_linearized(model, variables, est, batches,
                                       samples=6, rng=r, method="mc")
    np.testing.assert_allclose(lin, mc, rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(labels, labels2)


def test_linearized_predictive_nonlinear(fitted):
    """Nonlinear model: linearized predictives normalize, differ from the
    sampled push-through (the two predictives agree only in the linear
    case), and the probit/bridge variants run on linearized moments."""
    from curvature_tpu.eval import eval_bnn_linearized
    model, variables, est, batches = fitted
    r = jax.random.PRNGKey(3)
    for method in ("mc", "probit", "bridge"):
        preds, _ = eval_bnn_linearized(model, variables, est, batches,
                                       samples=4, rng=r, method=method)
        assert preds.shape == (48, 4)
        np.testing.assert_allclose(preds.sum(1), 1.0, rtol=1e-4)
        assert np.isfinite(preds).all()
    with pytest.raises(ValueError, match="unknown linearized"):
        eval_bnn_linearized(model, variables, est, batches, samples=2,
                            rng=r, method="exact")


def test_predictor_linearized(fitted):
    """Serving-surface GLM predictive: valid distributions, same shapes as
    MC, and bit-equal to MC for a linear model (single dense layer)."""
    from curvature_tpu.eval import BayesianPredictor
    model, variables, est, batches = fitted
    pred = BayesianPredictor(model, variables, est, samples=6,
                             rng=jax.random.PRNGKey(0))
    x = batches[0][0]
    mc = pred(x)
    lin = pred.predict_linearized(x)
    assert lin.mean.shape == mc.mean.shape
    np.testing.assert_allclose(np.asarray(lin.mean).sum(-1), 1.0, rtol=1e-4)
    assert np.isfinite(np.asarray(lin.epistemic)).all()

    linear_model = models.mlp([], 4)
    rngk = jax.random.PRNGKey(0)
    xl = jax.random.normal(rngk, (32, 6))
    vl = linear_model.init(rngk, xl)
    el = estimators.KFAC(linear_model, vl)
    el.update(xl, rng=jax.random.PRNGKey(1), num_samples=2)
    el.invert(add=1.0, multiply=10.0)
    p2 = BayesianPredictor(linear_model, vl, el, samples=6,
                           rng=jax.random.PRNGKey(2))
    a = p2(xl[:8])
    b = p2.predict_linearized(xl[:8])
    np.testing.assert_allclose(np.asarray(b.mean), np.asarray(a.mean),
                               rtol=1e-5, atol=1e-7)


def test_temperature_scaling():
    """fit_temperature recovers a known miscalibration scale, improves NLL
    and ECE, and never changes the argmax."""
    from curvature_tpu.eval import metrics
    from curvature_tpu.eval.calibrate import fit_temperature, temperature_scale
    rng = np.random.default_rng(0)
    k, n = 5, 4000
    true_logits = rng.standard_normal((n, k)).astype(np.float32) * 2.0
    probs = np.asarray(jax.nn.softmax(jnp.asarray(true_logits), axis=-1))
    labels = np.array([rng.choice(k, p=p) for p in probs], np.int32)
    overconfident = true_logits * 3.0        # optimal T is ~3

    t = fit_temperature(overconfident, labels)
    assert 2.5 < t < 3.6, t
    scaled = temperature_scale(overconfident, t)
    raw = np.asarray(jax.nn.softmax(jnp.asarray(overconfident), -1))
    assert float(metrics.negative_log_likelihood(scaled, labels)) < \
        float(metrics.negative_log_likelihood(raw, labels))
    assert float(metrics.expected_calibration_error(scaled, labels)[0]) < \
        float(metrics.expected_calibration_error(raw, labels)[0])
    np.testing.assert_array_equal(scaled.argmax(1), raw.argmax(1))


def test_eval_nn_temperature(fitted):
    from curvature_tpu.eval import eval_nn_temperature
    model, variables, _, batches = fitted
    probs, labels, t = eval_nn_temperature(model, variables, batches, batches)
    assert t > 0 and probs.shape == (48, 4)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)


def test_regression_predictive_exact_on_linear_model():
    """For Bayesian linear regression the linearized epistemic variance is
    x_t^T Sigma x_t with Sigma = (X^T X + tau I)^-1 — checked against the
    analytic value (statistically, 4000 samples), and gaussian_nll/rmse
    behave (NLL is minimized by the true variance)."""
    from curvature_tpu.eval import eval_bnn_regression, gaussian_nll, rmse
    rng_np = np.random.default_rng(0)
    n, din, tau = 64, 3, 2.0
    x = rng_np.standard_normal((n, din)).astype(np.float32)
    y = rng_np.standard_normal((n, 1)).astype(np.float32)
    xt = np.concatenate([x, np.ones((n, 1), np.float32)], axis=1)
    prec = xt.T @ xt + tau * np.eye(din + 1)
    sigma = np.linalg.inv(prec)
    theta = sigma @ (xt.T @ y[:, 0])

    model = models.mlp([], 1)
    model.init(jax.random.PRNGKey(0), x)       # populate metas
    variables = {"params": {
        "fc1": {"kernel": jnp.asarray(theta[:din, None]),
                "bias": jnp.asarray(theta[din:])}}}
    est = estimators.BlockDiagonal(model, variables, loss="gaussian")
    est.state = {"fc1": jnp.asarray(xt.T @ xt)}
    est.invert(add=tau, multiply=1.0)

    batches = [(x, y)]
    mean, var, labels = eval_bnn_regression(
        model, variables, est, batches, samples=4000,
        rng=jax.random.PRNGKey(1), noise_var=1.0)
    np.testing.assert_allclose(mean.mean(0), (xt @ theta).mean(), atol=0.05)
    want_epi = np.einsum("nd,df,nf->n", xt, sigma, xt)
    got_epi = var[:, 0] - 1.0
    np.testing.assert_allclose(got_epi, want_epi, rtol=0.15, atol=0.01)

    assert rmse(mean, labels) >= 0
    good = gaussian_nll(mean, var, labels)
    assert good < gaussian_nll(mean, var * 25.0, labels)
    assert np.isfinite(good)


def test_laplace_bridge_zero_variance_stable():
    """The bridge mean stays finite and argmax-preserving as logit
    variance -> 0 (the naive exp(mu/scale) form overflows f32 there)."""
    from curvature_tpu.eval import laplace_bridge
    mu = jnp.asarray([[2.0, -1.0, 0.5, 0.0]])
    for v in (1e-6, 1e-10, 0.0):
        _, mean = laplace_bridge(mu, v * jnp.ones_like(mu))
        m = np.asarray(mean)
        assert np.isfinite(m).all(), v
        np.testing.assert_allclose(m.sum(-1), 1.0, rtol=1e-5)
        assert int(m.argmax()) == 0
    # two-class edge: log(1 - 2/k) = -inf must not poison the mean
    _, mean2 = laplace_bridge(jnp.asarray([[1.0, -1.0]]),
                              0.5 * jnp.ones((1, 2)))
    assert np.isfinite(np.asarray(mean2)).all()


def test_stats_eval_matches_full_matrix_path():
    """The vocab-scale sufficient-statistics eval (eval_nn_stats /
    eval_bnn_stats) must reproduce the full-probability-matrix metrics
    exactly: accuracy, ECE (via ece_from_confidence), NLL, entropy."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from curvature_tpu import estimators, models
    from curvature_tpu.eval import eval_bnn, eval_nn, metrics
    from curvature_tpu.eval.evaluate import eval_bnn_stats, eval_nn_stats

    lm = models.gpt2_custom(vocab=17, dim=8, depth=1, heads=2, max_len=6)
    rng = jax.random.PRNGKey(0)
    tok = np.asarray(jax.random.randint(rng, (12, 6), 0, 17))
    variables = lm.init(rng, jnp.asarray(tok[:1]))
    labels = np.asarray(jax.random.randint(jax.random.PRNGKey(1),
                                           (12, 6), 0, 17))
    data = [(tok[:8], labels[:8]), (tok[8:], labels[8:])]

    probs, y = eval_nn(lm, variables, data)
    stats, y2 = eval_nn_stats(lm, variables, data)
    np.testing.assert_array_equal(y, y2)
    np.testing.assert_allclose(
        100.0 * stats[:, 2].mean(), float(metrics.accuracy(probs, y)),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(metrics.ece_from_confidence(stats[:, 1], stats[:, 2])[0]),
        float(metrics.expected_calibration_error(probs, y)[0]), rtol=1e-5)
    np.testing.assert_allclose(
        -np.mean(np.log(np.clip(stats[:, 0], 1e-12, None))),
        float(metrics.negative_log_likelihood(probs, y)), rtol=1e-5)
    np.testing.assert_allclose(
        stats[:, 3], np.asarray(metrics.predictive_entropy(probs)),
        rtol=1e-4, atol=1e-6)

    est = estimators.KFAC(lm, variables, loss="lm")
    est.update(jnp.asarray(tok), rng=jax.random.PRNGKey(2), num_samples=2)
    est.invert(1.0, 10.0)
    bnn_probs, _, _ = eval_bnn(lm, variables, est, data, samples=4,
                               rng=jax.random.PRNGKey(3))
    bnn_stats, _ = eval_bnn_stats(lm, variables, est, data, samples=4,
                                  rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        bnn_stats[:, 1], np.max(bnn_probs, axis=1), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        bnn_stats[:, 0],
        np.take_along_axis(bnn_probs, y[:, None], axis=1)[:, 0],
        rtol=1e-5, atol=1e-7)
    # chunked re-draw path: different (split) keys -> a different MC draw
    # of the same posterior; finite, full coverage, same shape
    bnn_chunked, _ = eval_bnn_stats(lm, variables, est, data, samples=4,
                                    rng=jax.random.PRNGKey(3),
                                    sample_chunk=2)
    assert bnn_chunked.shape == bnn_stats.shape
    assert np.isfinite(bnn_chunked).all()
    assert np.abs(bnn_chunked[:, 3] - bnn_stats[:, 3]).mean() < 0.5
