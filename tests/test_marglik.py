"""Log-det of the posterior precision + Laplace marginal likelihood.

Each estimator's ``logdet_state`` is validated against a DENSE numpy
construction of the exact precision matrix its sampler uses, and the full
evidence formula is validated against the closed-form marginal likelihood
of Bayesian linear regression computed from the N-dimensional marginal
Gaussian (an independent derivation — no shared code path).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.eval.marglik import dataset_map_nll, log_marginal_likelihood

ADD, MULT = 0.7, 3.0


@pytest.fixture(scope="module")
def small_mlp():
    model = models.mlp([7], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 5))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 4)
    return model, variables, x, labels


def _fit(cls, small_mlp, **kw):
    model, variables, x, labels = small_mlp
    est = cls(model, variables, **kw)
    est.update(x, labels=labels)
    return est


def test_logdet_diagonal(small_mlp):
    est = _fit(estimators.Diagonal, small_mlp)
    want = sum(np.sum(np.log(MULT * np.asarray(f) + ADD))
               for f in est.state.values())
    np.testing.assert_allclose(est.logdet_precision(ADD, MULT), want,
                               rtol=1e-5)


def test_logdet_block_dense(small_mlp):
    est = _fit(estimators.BlockDiagonal, small_mlp)
    want = 0.0
    for f in est.state.values():
        f = np.asarray(f, np.float64)
        p = MULT * (f + f.T) / 2 + ADD * np.eye(f.shape[0])
        want += np.linalg.slogdet(p)[1]
    np.testing.assert_allclose(est.logdet_precision(ADD, MULT), want,
                               rtol=1e-4)


def test_logdet_kfac_dense(small_mlp):
    est = _fit(estimators.KFAC, small_mlp)
    want = 0.0
    for fac in est.state.values():
        a = np.asarray(fac["a"], np.float64)
        g = np.asarray(fac["g"], np.float64)
        ad = math.sqrt(MULT) * (a + a.T) / 2 \
            + math.sqrt(ADD) * np.eye(a.shape[0])
        gd = math.sqrt(MULT) * (g + g.T) / 2 \
            + math.sqrt(ADD) * np.eye(g.shape[0])
        want += np.linalg.slogdet(np.kron(ad, gd))[1]
    np.testing.assert_allclose(est.logdet_precision(ADD, MULT), want,
                               rtol=1e-4)


def test_logdet_efb(small_mlp):
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    est = estimators.EFB(model, variables, kfac.state)
    est.update(x, labels=labels)
    want = sum(np.sum(np.log(MULT * np.asarray(lam) + ADD))
               for lam in est.state.values())
    np.testing.assert_allclose(est.logdet_precision(ADD, MULT), want,
                               rtol=1e-5)


def test_logdet_inf_dense(small_mlp):
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    diag = _fit(estimators.Diagonal, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    est = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    est.update(rank=10)
    want = 0.0
    for s in est.state.values():
        ua = np.asarray(s["ua"], np.float64)
        ug = np.asarray(s["ug"], np.float64)
        lam = np.asarray(s["lam"], np.float64)
        corr = np.clip(np.asarray(s["corr"], np.float64), 0.0, None)
        d = (MULT * corr + ADD).reshape(-1)
        v = np.kron(ua, ug)                      # layout k = i*m + j
        p = np.diag(d) + v @ np.diag(MULT * lam) @ v.T
        want += np.linalg.slogdet(p)[1]
    np.testing.assert_allclose(est.logdet_precision(ADD, MULT), want,
                               rtol=1e-4)


def test_marglik_exact_bayesian_linear_regression():
    """For unit-noise linear regression with prior N(0, 1/tau), Laplace is
    EXACT, so log_marginal_likelihood must reproduce the evidence computed
    from the marginal Gaussian y ~ N(0, I + X Xt / tau) — an independent
    closed form that never touches the Laplace decomposition."""
    rng = np.random.default_rng(0)
    n, din, tau = 24, 3, 1.7
    x = rng.standard_normal((n, din)).astype(np.float32)
    y = rng.standard_normal((n, 1)).astype(np.float32)
    xt = np.concatenate([x, np.ones((n, 1), np.float32)], axis=1)  # [N, d]
    d = din + 1
    prec = xt.T @ xt + tau * np.eye(d)
    theta = np.linalg.solve(prec, xt.T @ y[:, 0])                  # MAP

    model = models.mlp([], 1)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = {"params": {
        "fc1": {"kernel": jnp.asarray(theta[:din, None]),
                "bias": jnp.asarray(theta[din:])}}}
    est = estimators.BlockDiagonal(model, variables, loss="gaussian")
    # exact GGN/Hessian of the summed NLL; _flatten_grad order is weight
    # rows then bias, which for out=1 is exactly the [x, 1] column order
    est.state = {"fc1": jnp.asarray(xt.T @ xt)}

    nll = dataset_map_nll(model, variables, [(x, y)], loss="gaussian")
    resid = y[:, 0] - xt @ theta
    want_nll = 0.5 * float(resid @ resid) + 0.5 * n * math.log(2 * math.pi)
    np.testing.assert_allclose(nll, want_nll, rtol=1e-5)

    got = log_marginal_likelihood(est, nll, add=tau, multiply=1.0)
    cov = np.eye(n) + xt @ xt.T / tau
    want = -0.5 * (n * math.log(2 * math.pi)
                   + np.linalg.slogdet(cov)[1]
                   + float(y[:, 0] @ np.linalg.solve(cov, y[:, 0])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_marglik_requires_positive_prior(small_mlp):
    est = _fit(estimators.Diagonal, small_mlp)
    with pytest.raises(ValueError, match="add > 0"):
        log_marginal_likelihood(est, 0.0, add=0.0, multiply=1.0)


@pytest.mark.slow
def test_hyper_marglik_objective(tmp_path):
    """--objective marglik: tunes damping with zero validation passes and
    writes the standard stats/best-params artifacts."""
    import dataclasses
    from curvature_tpu.utils.config import Config
    from curvature_tpu.pipelines import factors as factors_pipe
    from curvature_tpu.pipelines import hyper as hyper_pipe
    from curvature_tpu.pipelines import training as train_pipe

    root = str(tmp_path)
    cfg = Config(root_dir=root, results_dir=root, model="lenet5",
                 data="synthetic", batch_size=32, epochs=1, mc_samples=1,
                 seed=0, objective="marglik", optimizer="random", calls=4)
    train_pipe.run(dataclasses.replace(cfg, lr=1e-2))
    factors_pipe.run(dataclasses.replace(cfg, estimator="kfac"))
    out = hyper_pipe.run(dataclasses.replace(cfg, estimator="kfac"))
    assert np.isfinite(out["best_cost"])
    assert len(out["stats"]["cost"]) >= 4
    # evidence is data-scale (not the 200-penalty scale): every candidate
    # with add > 0 must produce a finite evidence here
    assert all(c < hyper_pipe.MARGLIK_PENALTY for c in out["stats"]["cost"])

    # gradient ascent on the evidence (one jitted Adam loop) must match or
    # beat the 4-candidate random search above
    grad = hyper_pipe.run(dataclasses.replace(
        cfg, estimator="kfac", optimizer="grad", calls=150))
    assert grad["best_cost"] <= out["best_cost"] + 1e-6
    # per-layer joint tuning is reachable via --layer
    per_layer = hyper_pipe.run(dataclasses.replace(
        cfg, estimator="kfac", optimizer="grad", calls=150, layer=True))
    assert np.isfinite(per_layer["best_cost"])
    norms = per_layer["stats"]["norms"][-1]
    assert len(norms) >= 2 and len(set(np.round(norms, 6))) > 1


def test_logdet_split_attention_dense():
    """qkv-split and head-split attention factors: logdet equals the dense
    sum over Kronecker blocks (shared factors broadcast across blocks)."""
    model = models.tiny_transformer(vocab_free_dim=8, num_heads=2,
                                    num_layers=1, num_classes=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 5, 8))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 4)

    def dense_damped(f):
        f = np.asarray(f, np.float64)
        return math.sqrt(MULT) * (f + f.T) / 2 \
            + math.sqrt(ADD) * np.eye(f.shape[0])

    def block_logdets(fac):
        """Sum of slogdets over the layer's Kronecker blocks."""
        a, g = np.asarray(fac["a"]), np.asarray(fac["g"])
        tot = 0.0
        if a.ndim == 2 and g.ndim == 2:
            return np.linalg.slogdet(
                np.kron(dense_damped(a), dense_damped(g)))[1]
        if "a_bias" in fac:        # head-split out_proj: [H,d,d] A, one G
            gd = dense_damped(g)
            for ah in a:
                tot += np.linalg.slogdet(np.kron(dense_damped(ah), gd))[1]
            rb = math.sqrt(MULT) * float(fac["a_bias"]) + math.sqrt(ADD)
            tot += np.linalg.slogdet(rb * gd)[1]
            return tot
        ad = dense_damped(a)       # split in_proj: shared A, blocked G
        for gb in g.reshape((-1,) + g.shape[-2:]):
            tot += np.linalg.slogdet(np.kron(ad, dense_damped(gb)))[1]
        return tot

    for kw in ({"attention_qkv_split": True},
               {"attention_head_split": True}):
        est = estimators.KFAC(model, variables, **kw)
        est.update(x, labels=labels)
        want = sum(block_logdets(fac) for fac in est.state.values())
        np.testing.assert_allclose(est.logdet_precision(ADD, MULT), want,
                                   rtol=1e-4)


def test_marglik_gradient_tune(small_mlp):
    """Evidence gradient ascent: reaches (or beats) the best of a dense
    grid over shared (log norm, log scale); per-layer joint tuning can
    only improve on the shared optimum."""
    from curvature_tpu.eval.marglik import marglik_gradient_tune
    est = _fit(estimators.KFAC, small_mlp)
    nll = 100.0                       # constant shift, does not move argmax

    grid = np.linspace(-3, 3, 13)
    best_grid = max(
        log_marginal_likelihood(est, nll, 10.0 ** a, 10.0 ** s)
        for a in grid for s in grid)

    res = marglik_gradient_tune(est, nll, steps=300, lr=0.1)
    assert res["log_marglik"] >= best_grid - 0.5
    # the result is self-consistent with the direct evidence formula
    direct = log_marginal_likelihood(est, nll, res["norms"], res["scales"])
    np.testing.assert_allclose(res["log_marglik"], direct, rtol=1e-4)

    per_layer = marglik_gradient_tune(est, nll, steps=300, lr=0.1,
                                      per_layer=True)
    assert per_layer["log_marglik"] >= res["log_marglik"] - 0.05
    assert len(set(np.round(per_layer["norms"], 6))) > 1  # actually per-layer


def test_marglik_all_estimators_and_gradient_inf(small_mlp):
    """Evidence is computable (finite) for every estimator family, and the
    gradient tuner runs through INF's determinant-lemma logdet (eigh
    gradients) and EFB's eigenbasis logdet."""
    from curvature_tpu.eval.marglik import marglik_gradient_tune
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    diag = _fit(estimators.Diagonal, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    inf = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    inf.update(rank=8)
    for est in (diag, kfac, efb, inf, _fit(estimators.BlockDiagonal,
                                           small_mlp)):
        ml = log_marginal_likelihood(est, 50.0, add=0.5, multiply=2.0)
        assert np.isfinite(ml), type(est).__name__
    for est in (efb, inf):
        res = marglik_gradient_tune(est, 50.0, steps=40)
        assert np.isfinite(res["log_marglik"]), type(est).__name__


def _random_deltas(est, seed=3):
    rng = np.random.default_rng(seed)
    return {name: jnp.asarray(rng.standard_normal(
        ((m.stacked,) if m.stacked else ())
        + (m.out_features, m.mat_cols)).astype(np.float32))
        for name, m in est.metas.items()}


def test_quadratic_form_dense_parity(small_mlp):
    """delta^T P delta against dense constructions of each estimator's
    damped precision (same P the logdet tests verify), and log_density is
    the full Gaussian identity at the mean."""
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    diag = _fit(estimators.Diagonal, small_mlp)
    block = _fit(estimators.BlockDiagonal, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    inf = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    inf.update(rank=10)

    deltas = _random_deltas(kfac)

    # Diagonal
    want = sum(float(np.sum((MULT * np.asarray(diag.state[n]) + ADD)
                            * np.asarray(deltas[n]) ** 2))
               for n in deltas)
    np.testing.assert_allclose(diag.quadratic_form(deltas, ADD, MULT), want,
                               rtol=1e-4)

    # BlockDiagonal: flatten in weight-rows-then-bias order
    want = 0.0
    for n, meta in block.metas.items():
        f = np.asarray(block.state[n], np.float64)
        p = MULT * (f + f.T) / 2 + ADD * np.eye(f.shape[0])
        d = np.asarray(deltas[n], np.float64)
        v = np.concatenate([d[:, :-1].reshape(-1), d[:, -1]])
        want += v @ p @ v
    np.testing.assert_allclose(block.quadratic_form(deltas, ADD, MULT),
                               want, rtol=1e-4)

    # KFAC: vec-form Kronecker (row-major vec of [out, cols] pairs with
    # kron(G_d, A_d)); equivalently sum(d * (G_d d A_d))
    want = 0.0
    for n in deltas:
        a = np.asarray(kfac.state[n]["a"], np.float64)
        g = np.asarray(kfac.state[n]["g"], np.float64)
        ad = math.sqrt(MULT) * (a + a.T) / 2 \
            + math.sqrt(ADD) * np.eye(a.shape[0])
        gd = math.sqrt(MULT) * (g + g.T) / 2 \
            + math.sqrt(ADD) * np.eye(g.shape[0])
        d = np.asarray(deltas[n], np.float64)
        want += float(np.sum(d * (gd @ d @ ad)))
    np.testing.assert_allclose(kfac.quadratic_form(deltas, ADD, MULT), want,
                               rtol=1e-4)

    # EFB: eigenbasis weights
    want = 0.0
    for n in deltas:
        ua = np.asarray(efb.eigvecs[n]["a"], np.float64)
        ug = np.asarray(efb.eigvecs[n]["g"], np.float64)
        w = MULT * np.asarray(efb.state[n], np.float64) + ADD
        rot = ug.T @ np.asarray(deltas[n], np.float64) @ ua
        want += float(np.sum(w * rot * rot))
    np.testing.assert_allclose(efb.quadratic_form(deltas, ADD, MULT), want,
                               rtol=1e-4)

    # INF: dense D + V S^2 V^T in the k = i*m + j flat layout
    want = 0.0
    for n in deltas:
        s = inf.state[n]
        ua = np.asarray(s["ua"], np.float64)
        ug = np.asarray(s["ug"], np.float64)
        lam = np.asarray(s["lam"], np.float64)
        corr = np.clip(np.asarray(s["corr"], np.float64), 0.0, None)
        dvec = np.asarray(deltas[n], np.float64).T.reshape(-1)
        v = np.kron(ua, ug)
        p = np.diag(MULT * corr.reshape(-1) + ADD) \
            + v @ np.diag(MULT * lam) @ v.T
        want += dvec @ p @ dvec
    np.testing.assert_allclose(inf.quadratic_form(deltas, ADD, MULT), want,
                               rtol=1e-4)

    # log_density at the mean: -d/2 log 2pi + logdet/2 exactly
    d_tot = sum(v.size for v in deltas.values())
    ld = kfac.log_density(variables["params"], ADD, MULT)
    want = -0.5 * d_tot * math.log(2 * math.pi) \
        + 0.5 * kfac.logdet_precision(ADD, MULT)
    np.testing.assert_allclose(ld, want, rtol=1e-5)
    # and it decreases away from the mean
    off = jax.tree_util.tree_map(lambda a: a + 0.1, variables["params"])
    assert kfac.log_density(off, ADD, MULT) < ld
