"""Nyström subspace (global low-rank) Laplace estimator.

At full sketch width (R = p) the Nyström approximation is exact, so every
posterior quantity — log-determinant, quadratic form, and the sampling
covariance itself — is validated against a DENSE construction of
P = D + M^{1/2} F M^{1/2} with F the exact GGN assembled column-by-column
from ops/matfree.ggn_matvec (an independent code path: capture-free JVP
products vs the estimator's own sketch accumulation).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.ops import matfree

ADD, MULT = 0.7, 3.0


@pytest.fixture(scope="module")
def problem():
    model = models.mlp([7], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 5))
    variables = model.init(rng, x)
    metas = estimators.Diagonal(model, variables).metas
    shapes = matfree.delta_shapes(metas)
    names = list(shapes)
    sizes = [int(np.prod(shapes[n])) for n in names]
    p = sum(sizes)

    def unflat(v):
        out, i = {}, 0
        for n, s in zip(names, sizes):
            out[n] = jnp.asarray(v[i:i + s], jnp.float32).reshape(shapes[n])
            i += s
        return out

    def flat(d):
        return np.concatenate([np.asarray(d[n]).reshape(-1) for n in names])

    mv = jax.jit(lambda d: matfree.ggn_matvec(model, metas, variables, x, d))
    F = np.stack([flat(mv(unflat(np.eye(p)[j]))) for j in range(p)], axis=1)
    F = (F + F.T) / 2
    return model, variables, x, names, sizes, p, unflat, flat, F


@pytest.fixture(scope="module")
def fitted(problem):
    model, variables, x, *_ = problem
    est = estimators.Subspace(model, variables, rank=10 ** 6)  # clips to p
    est.update(x, rng=jax.random.PRNGKey(3))
    return est


def test_rank_clips_to_param_count(problem, fitted):
    p = problem[5]
    assert fitted.rank == p


def test_sketch_is_exact_ggn_product(problem, fitted):
    _, _, _, names, _, p, unflat, flat, F = problem
    om = np.stack([flat({n: fitted.state[n]["omega"][r] for n in names})
                   for r in range(p)], axis=1)
    y = np.stack([flat({n: fitted.state[n]["sketch"][r] for n in names})
                  for r in range(p)], axis=1)
    np.testing.assert_allclose(y, F @ om, atol=5e-3 * np.abs(F @ om).max())


def test_logdet_matches_dense(problem, fitted):
    p, F = problem[5], problem[8]
    want = np.linalg.slogdet(MULT * F + ADD * np.eye(p))[1]
    np.testing.assert_allclose(fitted.logdet_precision(ADD, MULT), want,
                               rtol=5e-3)


def test_quadratic_form_matches_dense(problem, fitted):
    _, _, _, _, _, p, unflat, flat, F = problem
    delta = unflat(np.random.default_rng(0).normal(size=p))
    dv = flat(delta)
    want = dv @ (MULT * F + ADD * np.eye(p)) @ dv
    np.testing.assert_allclose(fitted.quadratic_form(delta, ADD, MULT), want,
                               rtol=5e-3)


def test_sampling_covariance_is_inverse_precision(problem, fitted):
    _, _, _, _, _, p, unflat, flat, F = problem
    inv = fitted.invert(ADD, MULT)
    sqrt = jax.jit(fitted._apply_sqrt)
    a = np.stack([flat(sqrt(inv, unflat(np.eye(p)[j]))) for j in range(p)],
                 axis=1)
    want = np.linalg.inv(MULT * F + ADD * np.eye(p))
    np.testing.assert_allclose(a @ a.T, want, atol=5e-3 * np.abs(want).max())


def test_per_layer_damping_matches_dense(problem, fitted):
    _, _, _, names, sizes, p, unflat, flat, F = problem
    adds, mults = [0.4, 1.3], [2.0, 0.5]
    d = np.concatenate([np.full(s, a) for s, a in zip(sizes, adds)])
    m = np.concatenate([np.full(s, v) for s, v in zip(sizes, mults)])
    prec = np.diag(d) + np.sqrt(m)[:, None] * F * np.sqrt(m)[None, :]
    np.testing.assert_allclose(fitted.logdet_precision(adds, mults),
                               np.linalg.slogdet(prec)[1], rtol=5e-3)
    delta = unflat(np.random.default_rng(1).normal(size=p))
    np.testing.assert_allclose(
        fitted.quadratic_form(delta, adds, mults),
        flat(delta) @ prec @ flat(delta), rtol=5e-3)
    inv = fitted.invert(adds, mults)
    sqrt = jax.jit(fitted._apply_sqrt)
    a = np.stack([flat(sqrt(inv, unflat(np.eye(p)[j]))) for j in range(p)],
                 axis=1)
    want = np.linalg.inv(prec)
    np.testing.assert_allclose(a @ a.T, want, atol=5e-3 * np.abs(want).max())


def test_low_rank_is_finite_and_psd(problem):
    model, variables, x = problem[:3]
    est = estimators.Subspace(model, variables, rank=8)
    est.update(x, rng=jax.random.PRNGKey(3))
    lam = np.asarray(est.eigenvalues())
    assert lam.shape == (8,) and (lam >= 0).all()
    assert np.isfinite(est.logdet_precision(ADD, MULT))
    est.invert(ADD, MULT)
    draw = est.sample(jax.random.PRNGKey(7))
    assert all(np.isfinite(np.asarray(v)).all() for v in draw.values())


def test_scan_folded_batches_match_sequential(problem):
    model, variables, _ = problem[:3]
    xs = jax.random.normal(jax.random.PRNGKey(9), (3, 16, 5))
    est_a = estimators.Subspace(model, variables, rank=8)
    est_a.update_batches(xs, jax.random.PRNGKey(4))
    est_b = estimators.Subspace(model, variables, rank=8)
    for i in range(3):
        est_b.update(xs[i], rng=jax.random.PRNGKey(4))
    for n in est_a.state:
        np.testing.assert_allclose(np.asarray(est_a.state[n]["sketch"]),
                                   np.asarray(est_b.state[n]["sketch"]),
                                   rtol=2e-4, atol=1e-6)


def test_labels_and_mc_set_only_the_weight(problem):
    """The GGN takes the label expectation analytically: explicit labels and
    MC draws must land on the same sketch up to the sample-count weight."""
    model, variables, x = problem[:3]
    est_rng = estimators.Subspace(model, variables, rank=6)
    est_rng.update(x, rng=jax.random.PRNGKey(0), num_samples=3)
    est_lbl = estimators.Subspace(model, variables, rank=6)
    labels = jax.random.randint(jax.random.PRNGKey(1), (3, 16), 0, 4)
    est_lbl.update(x, labels=labels)
    for n in est_rng.state:
        np.testing.assert_allclose(np.asarray(est_rng.state[n]["sketch"]),
                                   np.asarray(est_lbl.state[n]["sketch"]),
                                   rtol=1e-6)


def test_lm_loss_weighting_matches_kfac_convention(problem):
    """Regression (round-4 advisor): loss='lm' must survive __init__ so
    base.update expands [B, T] token labels to [1, B, T] — otherwise the
    sample-count weight becomes B and the sketch inflates by the batch
    size. Explicit-label and MC updates must agree (analytic expectation),
    and one [B, T] label set must weigh as ONE sample, not B."""
    from curvature_tpu import models as _models
    lm = _models.gpt2_custom(vocab=11, dim=8, depth=1, heads=2, max_len=6)
    rng = jax.random.PRNGKey(0)
    tok = jax.random.randint(rng, (4, 6), 0, 11)
    variables = lm.init(rng, tok)
    est = estimators.Subspace(lm, variables, rank=5, loss="lm")
    assert est.loss == "lm"
    est.update(tok, rng=jax.random.PRNGKey(1), num_samples=1)
    est_lbl = estimators.Subspace(lm, variables, rank=5, loss="lm")
    labels = jax.random.randint(jax.random.PRNGKey(2), (4, 6), 0, 11)
    est_lbl.update(tok, labels=labels)  # [B, T] -> one sample's weight
    for n in est.state:
        np.testing.assert_allclose(np.asarray(est_lbl.state[n]["sketch"]),
                                   np.asarray(est.state[n]["sketch"]),
                                   rtol=1e-5, atol=1e-7)


def test_ensemble_params_structure(problem):
    model, variables, x = problem[:3]
    est = estimators.Subspace(model, variables, rank=4)
    est.update(x, rng=jax.random.PRNGKey(2))
    est.invert(0.5, 1.0)
    ens = est.ensemble_params(jax.random.PRNGKey(5), 3)
    for name, leaf in variables["params"].items():
        for k, v in leaf.items():
            assert ens[name][k].shape == (3,) + v.shape


def test_layer_filter_restricts_subspace(problem):
    model, variables, x = problem[:3]
    est = estimators.Subspace(model, variables, rank=4, layer_filter="last")
    assert list(est.metas) == ["fc2"]
    est.update(x, rng=jax.random.PRNGKey(2))
    est.invert(0.5, 1.0)
    draw = est.sample(jax.random.PRNGKey(3))
    assert set(draw) == {"fc2"}


def test_marglik_integration(problem):
    from curvature_tpu.eval.marglik import log_marginal_likelihood
    model, variables, x = problem[:3]
    est = estimators.Subspace(model, variables, rank=8)
    est.update(x, rng=jax.random.PRNGKey(2))
    lml = log_marginal_likelihood(est, nll_sum=10.0, add=1.0, multiply=1.0)
    assert np.isfinite(lml)


def test_sharded_sketch_matches_single_device(problem):
    """The sketch is a sum over batch rows, so a data-sharded update must
    reproduce the single-device sketch exactly (GSPMD psum)."""
    from curvature_tpu import parallel
    model, variables, x = problem[:3]
    assert len(jax.devices()) == 8
    est = estimators.Subspace(model, variables, rank=8)
    single = est._jit_update_rng(est.init_state(), variables, x,
                                 jax.random.PRNGKey(0), 1)
    est_m = estimators.Subspace(model, variables, rank=8)
    mesh = parallel.make_mesh({"data": 8})
    est_m.use_mesh(mesh)
    with mesh:
        sharded = est_m._jit_update_rng_sharded(
            est_m.init_state(), variables, parallel.shard_batch(x, mesh),
            jax.random.PRNGKey(0), 1)
    for n in single:
        np.testing.assert_allclose(np.asarray(sharded[n]["sketch"]),
                                   np.asarray(single[n]["sketch"]),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_subspace_cli_chain(tmp_path):
    """factors --estimator subspace -> hyper (marglik grad) -> evaluate
    --ood, the reference's pipeline order on synthetic data."""
    import dataclasses
    import os

    from curvature_tpu.utils.config import Config
    from curvature_tpu.utils.checkpoint import factors_path
    from curvature_tpu.pipelines import factors as factors_pipe
    from curvature_tpu.pipelines import evaluate as eval_pipe
    from curvature_tpu.pipelines import hyper as hyper_pipe

    cfg = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                 model="lenet5", data="synthetic", batch_size=64, epochs=1,
                 samples=3, mc_samples=1, rank=12, seed=0,
                 estimator="subspace")
    est = factors_pipe.run(cfg)
    assert est.rank == 12
    assert os.path.exists(factors_path(cfg) + ".npz")

    hyper_cfg = dataclasses.replace(cfg, objective="marglik",
                                    optimizer="grad", calls=5)
    out = hyper_pipe.run(hyper_cfg)
    assert np.isfinite(out["best_cost"])

    eval_cfg = dataclasses.replace(cfg, ood=True, norm=1e2, scale=1e1)
    preds, bnn_preds, labels = eval_pipe.run(eval_cfg)
    assert np.isfinite(bnn_preds).all()


def test_joint_fidelity_captures_cross_layer_curvature(problem, fitted):
    """The ``__joint__`` fidelity row probes all layers at once: the exact
    full-rank Subspace answers it (near-)exactly, while a layer-local
    estimator's block-sum answer misses the cross-layer terms."""
    from curvature_tpu.eval.fidelity import fidelity_report
    model, variables, x = problem[:3]
    rep_sub = fidelity_report(fitted, x, jax.random.PRNGKey(11),
                              num_probes=4, norm=1.0, joint=True)
    assert rep_sub["__joint__"]["scaled_rel_err"] < 2e-2

    block = estimators.BlockDiagonal(model, variables)
    # exact per-layer blocks from many MC draws would still miss cross
    # terms; use the analytic comparison instead: block quad == sum of
    # exact per-layer quads, so its joint error IS the cross-layer mass
    block.update(x, rng=jax.random.PRNGKey(0), num_samples=64)
    rep_blk = fidelity_report(block, x, jax.random.PRNGKey(11),
                              num_probes=4, norm=64.0, joint=True)
    assert rep_blk["__joint__"]["scaled_rel_err"] > \
        rep_sub["__joint__"]["scaled_rel_err"]


def test_facade_lowrank(problem):
    from curvature_tpu import laplace
    model, variables, x = problem[:3]
    labels = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 4))
    la = laplace.fit(model, variables, [(np.asarray(x), labels)],
                     estimator="lowrank", rank=8,
                     rng=jax.random.PRNGKey(0))
    res = la.optimize_prior_precision(steps=20)
    assert np.isfinite(res["log_marglik"])
    probs = la.predictive(np.asarray(x), samples=4)
    assert probs.shape == (16, 4)
    assert np.isfinite(np.asarray(probs)).all()
