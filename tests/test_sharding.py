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
