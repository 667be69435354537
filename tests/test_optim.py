"""KFAC-preconditioned training (curvature_tpu/optim.py): preconditioning
math against dense Kronecker algebra, natural-gradient training progress,
and the --optimizer kfac CLI path."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from curvature_tpu import estimators, models, optim


@pytest.fixture(scope="module")
def fitted_kfac():
    model = models.mlp([7], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (32, 5))
    variables = model.init(rng, x)
    est = estimators.KFAC(model, variables)
    est.update(x, rng=jax.random.PRNGKey(1), num_samples=2)
    est.invert(add=0.5, multiply=2.0)
    return model, variables, est, x


def test_precondition_matches_dense_kron(fitted_kfac):
    """precondition == unvec(kron(A_d^-1, G_d^-1) vec(G)) per layer."""
    model, variables, est, x = fitted_kfac
    grads = jax.tree_util.tree_map(
        lambda a: jnp.ones_like(a) * 0.1 + jnp.arange(a.size,
                                                      dtype=a.dtype
                                                      ).reshape(a.shape) / a.size,
        variables["params"])
    pg = optim.precondition(est.metas, est.inv_state, grads)
    for name, meta in est.metas.items():
        a_chol = np.asarray(est.inv_state[name]["a_chol"], np.float64)
        g_chol = np.asarray(est.inv_state[name]["g_chol"], np.float64)
        a_inv = a_chol @ a_chol.T
        g_inv = g_chol @ g_chol.T
        from curvature_tpu.nn.core import param_matrix
        gmat = np.asarray(param_matrix(meta, grads[name]), np.float64)
        want = g_inv @ gmat @ a_inv
        got = np.asarray(param_matrix(meta, pg[name]), np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_precondition_rejects_split_factors(fitted_kfac):
    model = models.tiny_transformer(vocab_free_dim=8, num_heads=2,
                                    num_layers=1, num_classes=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 5, 8))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 4)
    grads = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    for kw in ({"attention_qkv_split": True},
               {"attention_head_split": True}):
        est = estimators.KFAC(model, variables, **kw)
        est.update(x, labels=labels)
        est.invert(add=0.5, multiply=2.0)
        with pytest.raises(ValueError, match="posterior-only"):
            optim.precondition(est.metas, est.inv_state, grads)


def test_kfac_step_trains(fitted_kfac):
    """Natural-gradient steps reduce the loss on a separable problem and
    keep factors/inverse finite; the lax.cond re-inversion fires."""
    model, variables, _, _ = fitted_kfac
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (64, 5))
    y = (x[:, 0] > 0).astype(np.int32) + 2 * (x[:, 1] > 0).astype(np.int32)

    est = estimators.KFAC(model, variables)
    tx = optax.sgd(0.05, momentum=0.9)
    step, init = optim.make_kfac_train_step(model, est, tx, ema=0.9,
                                            damping=1e-1, invert_every=3)
    params = variables["params"]
    stats = {}
    factors, inv = init({"params": params, "batch_stats": stats},
                        x, y, jax.random.PRNGKey(4))
    opt_state = tx.init(params)
    count = jnp.zeros((), jnp.int32)
    losses = []
    key = jax.random.PRNGKey(5)
    for _ in range(25):
        key, k = jax.random.split(key)
        params, opt_state, factors, inv, stats, count, loss = step(
            params, opt_state, factors, inv, stats, count, x, y, k)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.6, losses[::6]
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(inv))


@pytest.mark.slow
def test_training_cli_kfac(tmp_path):
    """--optimizer kfac drives the natural-gradient path end to end and
    reaches a lower loss than the same-budget SGD run."""
    from curvature_tpu.utils.config import Config
    from curvature_tpu.pipelines import training as train_pipe

    base = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                  model="lenet5", data="synthetic", batch_size=64,
                  epochs=2, lr=5e-2, seed=0)
    _, hist_sgd = train_pipe.run(base)
    _, hist_kfac = train_pipe.run(dataclasses.replace(
        base, optimizer="kfac", lr=5e-2))
    assert np.isfinite(hist_kfac["loss"]).all()
    assert hist_kfac["loss"][-1] < hist_sgd["loss"][0]
