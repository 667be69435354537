"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The factor update is a sum over the batch (and MC-sample) axis, so sharding
the batch over a mesh and psum-reducing must reproduce the single-device
factors exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models, parallel


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    model = models.mlp([16], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (32, 8))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 4)
    return model, variables, x, labels


def test_sharded_kfac_matches_single_device(setup):
    model, variables, x, labels = setup
    est = estimators.KFAC(model, variables)
    single = est._jit_update(est.init_state(), variables, x, labels)

    mesh = parallel.make_mesh({"data": 8})
    step = parallel.sharded_update_fn(est, mesh)
    with mesh:
        sharded = step(est.init_state(), variables,
                       parallel.shard_batch(x, mesh), labels)
    for name in single:
        np.testing.assert_allclose(np.asarray(sharded[name]["a"]),
                                   np.asarray(single[name]["a"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded[name]["g"]),
                                   np.asarray(single[name]["g"]),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_diagonal_matches_single_device(setup):
    model, variables, x, labels = setup
    est = estimators.Diagonal(model, variables)
    single = est._jit_update(est.init_state(), variables, x, labels)

    mesh = parallel.make_mesh({"data": 8})
    step = parallel.sharded_update_fn(est, mesh)
    with mesh:
        sharded = step(est.init_state(), variables,
                       parallel.shard_batch(x, mesh), labels)
    for name in single:
        np.testing.assert_allclose(np.asarray(sharded[name]),
                                   np.asarray(single[name]),
                                   rtol=1e-5, atol=1e-6)


def test_2d_mesh_data_and_sample(setup):
    """Batch sharded over 'data', MC samples over 'sample'."""
    model, variables, x, _ = setup
    labels = jax.random.randint(jax.random.PRNGKey(2), (4, 32), 0, 4)
    est = estimators.KFAC(model, variables)
    single = est._jit_update(est.init_state(), variables, x, labels)

    mesh = parallel.make_mesh({"sample": 2, "data": 4})
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    step = jax.jit(
        est._step,
        in_shardings=(rep, rep, NamedSharding(mesh, P("data")),
                      NamedSharding(mesh, P("sample", "data"))),
        out_shardings=rep)
    with mesh:
        sharded = step(est.init_state(), variables, x, labels)
    for name in single:
        np.testing.assert_allclose(np.asarray(sharded[name]["g"]),
                                   np.asarray(single[name]["g"]),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_efb_matches_single_device(setup):
    """EFB's update carries (state, diags, eigvecs); under the mesh the
    whole carry rides as a replicated jit argument (the donation-bug class
    from round 1 lived exactly here)."""
    model, variables, x, labels = setup
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)

    single = estimators.EFB(model, variables, kfac.state)
    single.update(x, labels=labels)
    single.update_batches(jnp.stack([x, x + 1]), jax.random.PRNGKey(3),
                          num_samples=2)

    mesh = parallel.make_mesh({"data": 8})
    sharded = estimators.EFB(model, variables, kfac.state).use_mesh(mesh)
    sharded.update(x, labels=labels)
    sharded.update_batches(jnp.stack([x, x + 1]), jax.random.PRNGKey(3),
                           num_samples=2)

    for name in single.state:
        np.testing.assert_allclose(np.asarray(sharded.state[name]),
                                   np.asarray(single.state[name]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded.diags[name]),
                                   np.asarray(single.diags[name]),
                                   rtol=1e-5, atol=1e-6)
    # invert + sample still work from the mesh-produced state
    sharded.invert(add=1.0, multiply=10.0)
    s = sharded.sample(jax.random.PRNGKey(4))
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in s.values())


def test_sharded_inf_invert_sample_matches_single_device(setup):
    """INF build + damped invert + sampling executed as mesh programs
    (state replicated) reproduce the single-device results."""
    model, variables, x, labels = setup
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)
    diag = estimators.Diagonal(model, variables)
    diag.update(x, labels=labels)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)

    def build():
        est = estimators.INF(model, variables, diag.state, kfac.state,
                             efb.state, eigvecs=efb.eigvecs)
        est.update(rank=10, bucket=4)
        return est

    single = build()
    single.invert(add=1.0, multiply=10.0)
    d_single = single.sample(jax.random.PRNGKey(5))

    mesh = parallel.make_mesh({"data": 8})
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    sharded = build()
    # run invert and sample as mesh programs with replicated operands
    sharded._jit_invert = jax.jit(sharded.invert_state,
                                  in_shardings=(rep, rep, rep),
                                  out_shardings=rep)
    sharded._jit_sample = jax.jit(sharded.sample_state,
                                  in_shardings=(rep, rep),
                                  out_shardings=rep)
    sharded.invert(add=1.0, multiply=10.0)
    d_sharded = sharded.sample(jax.random.PRNGKey(5))

    for name in d_single:
        np.testing.assert_allclose(np.asarray(d_sharded[name]),
                                   np.asarray(d_single[name]),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_grouped_kfac_matches_single_device():
    """Grouped-conv per-group block factors under batch sharding: the
    group-axis einsum Grams psum exactly like the dense path."""
    from tests.test_grouped import _GroupedNet
    import curvature_tpu.nn as nn

    model = nn.Model(_GroupedNet())
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (16, 6, 6, 3))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(8), (2, 16), 0, 5)

    est = estimators.KFAC(model, variables)
    single = est._jit_update(est.init_state(), variables, x, labels)

    mesh = parallel.make_mesh({"data": 8})
    step = parallel.sharded_update_fn(est, mesh)
    with mesh:
        sharded = step(est.init_state(), variables,
                       parallel.shard_batch(x, mesh), labels)
    for name in single:
        for key in ("a", "g"):
            np.testing.assert_allclose(np.asarray(sharded[name][key]),
                                       np.asarray(single[name][key]),
                                       rtol=1e-5, atol=1e-6)


def test_batched_hyper_evaluator_on_mesh(setup):
    """make_batched_evaluator with a mesh: validation batch sharded over
    the data axis, candidate costs equal to the meshless evaluator."""
    from curvature_tpu.pipelines.hyper import make_batched_evaluator
    from curvature_tpu.utils.config import Config

    model, variables, x, labels = setup
    est = estimators.KFAC(model, variables)
    est.update(x, labels=labels)

    y = np.asarray(labels)[0]
    val_batches = [(np.asarray(x), y), (np.asarray(x) + 1, y)]
    cfg = Config(samples=3, pre_scale=1)

    norms = [1.0, 10.0, 0.1]
    scales = [1.0, 5.0, 50.0]
    key = jax.random.PRNGKey(6)
    plain = make_batched_evaluator(cfg, model, variables, est, val_batches)
    mesh = parallel.make_mesh({"data": 8})
    meshed = make_batched_evaluator(cfg, model, variables, est, val_batches,
                                    mesh=mesh)
    r1 = plain(norms, scales, key)
    r2 = meshed(norms, scales, key)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a["cost"], b["cost"], rtol=1e-5,
                                   atol=1e-6)


def test_swag_predictor_on_mesh(setup):
    """SWAG's stacked ensemble shards over the predictor's sample axis
    exactly like the Laplace ensembles (same [S, ...] pytree surface)."""
    from curvature_tpu.estimators.swag import SWAG
    from curvature_tpu.eval import BayesianPredictor
    model, variables, x, _ = setup
    sw = SWAG(model, variables)
    for i in range(3):
        sw.collect(jax.tree_util.tree_map(lambda a: a + 0.01 * i,
                                          variables["params"]))
    sw.invert(multiply=1.0)
    mesh = parallel.make_mesh({"sample": 8})
    pred_mesh = BayesianPredictor(model, variables, sw, samples=8,
                                  rng=jax.random.PRNGKey(0), mesh=mesh)
    pred_one = BayesianPredictor(model, variables, sw, samples=8,
                                 rng=jax.random.PRNGKey(0))
    a = pred_mesh(x[:8])
    b = pred_one(x[:8])
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean),
                               rtol=1e-5, atol=1e-6)


def test_logdet_and_marglik_tune_with_replicated_state(setup):
    """logdet_precision / evidence gradient tuning run unchanged when the
    factor state lives on a mesh (replicated) — the jitted transforms take
    the state as arguments, so placement is transparent."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from curvature_tpu.eval.marglik import marglik_gradient_tune
    model, variables, x, labels = setup
    est = estimators.KFAC(model, variables)
    est.update(x, labels=labels)
    base = est.logdet_precision(0.5, 2.0)
    mesh = parallel.make_mesh({"data": 8})
    rep = NamedSharding(mesh, P())
    est.state = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), est.state)
    np.testing.assert_allclose(est.logdet_precision(0.5, 2.0), base,
                               rtol=1e-6)
    res = marglik_gradient_tune(est, 10.0, steps=30)
    assert np.isfinite(res["log_marglik"])


def test_training_step_on_mesh_matches_single_device(setup):
    """SGD training under --parallel: sharding the batch changes nothing
    (gradient psums are exact); the kfac natural-gradient step too."""
    import optax
    from curvature_tpu.pipelines.training import make_train_step
    from curvature_tpu import optim
    model, variables, x, _ = setup
    y = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 4))
    mesh = parallel.make_mesh({"data": 8})
    tx = optax.sgd(0.05, momentum=0.9)

    plain = make_train_step(model, tx)
    sharded = make_train_step(model, tx, mesh=mesh)
    p0, o0 = variables["params"], tx.init(variables["params"])
    pa, _, _, la = plain(p0, o0, {}, jnp.asarray(x), jnp.asarray(y))
    pb, _, _, lb = sharded(p0, o0, {}, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        pa, pb)
    # ragged batch (not divisible by 8) falls back, still correct
    pc, _, _, lc = sharded(p0, o0, {}, jnp.asarray(x[:30]),
                           jnp.asarray(y[:30]))
    assert np.isfinite(float(lc))

    est = estimators.KFAC(model, variables)
    kstep, kinit = optim.make_kfac_train_step(model, est, tx, damping=0.1,
                                              mesh=mesh)
    factors, inv = kinit(variables, jnp.asarray(x), jnp.asarray(y),
                         jax.random.PRNGKey(3))
    out = kstep(p0, tx.init(p0), factors, inv, {},
                jnp.zeros((), jnp.int32), jnp.asarray(x), jnp.asarray(y),
                jax.random.PRNGKey(4))
    assert np.isfinite(float(out[-1]))


def test_loss_landscape_eval_on_mesh_matches_single_device(setup):
    """Chunked landscape evaluation under a mesh equals single-device."""
    from curvature_tpu.pipelines.loss_landscape import (evaluate_points,
                                                        make_point_evaluator,
                                                        random_direction)
    model, variables, x, _ = setup
    y = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 4))
    batches = [(np.asarray(x), y)]
    direction = random_direction(variables["params"], jax.random.PRNGKey(5))
    coords = np.linspace(-0.5, 0.5, 5)[:, None]
    l0, a0 = evaluate_points(model, variables, [direction], coords, batches,
                             chunk=4)
    mesh = parallel.make_mesh({"data": 8})
    l1, a1 = make_point_evaluator(model, variables, [direction], 4,
                                  mesh=mesh)(coords, batches)
    np.testing.assert_allclose(l1, l0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a1, a0, rtol=1e-5)


def test_alternate_predictives_on_mesh(setup):
    """Closed-form and linearized predictives under a data-sharded mesh
    equal single-device (the --parallel --predictive combination)."""
    from curvature_tpu.eval import eval_bnn_closed_form, eval_bnn_linearized
    model, variables, x, labels = setup
    est = estimators.KFAC(model, variables)
    est.update(x, labels=labels)
    est.invert(0.5, 2.0)
    batches = [(np.asarray(x), np.zeros(32, np.int32))]
    mesh = parallel.make_mesh({"data": 8})
    rng = jax.random.PRNGKey(0)
    for fn, kw in ((eval_bnn_closed_form, {"method": "probit"}),
                   (eval_bnn_linearized, {"method": "mc"})):
        a, _ = fn(model, variables, est, batches, 4, rng, **kw)
        b, _ = fn(model, variables, est, batches, 4, rng, mesh=mesh, **kw)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
