"""dm-haiku interop: estimators on an unmodified haiku model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators
from curvature_tpu.nn.haiku_adapter import from_haiku

hk = pytest.importorskip("haiku")


def _forward(x):
    x = hk.Conv2D(4, kernel_shape=3, padding="SAME", name="conv1")(x)
    x = jax.nn.relu(x)
    x = hk.avg_pool(x, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    x = x.reshape((x.shape[0], -1))
    x = jax.nn.relu(hk.Linear(16, name="hidden")(x))
    return hk.Linear(3, name="head")(x)


@pytest.fixture(scope="module")
def haiku_setup():
    transformed = hk.transform(_forward)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 8, 8, 2))
    hk_params = transformed.init(rng, x)
    model, variables = from_haiku(transformed, hk_params, x)
    return transformed, hk_params, model, variables, x


def test_forward_matches_haiku(haiku_setup):
    transformed, hk_params, model, variables, x = haiku_setup
    expected = transformed.apply(hk_params, None, x)
    out, _ = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-6)
    assert set(model.metas) == {"conv1", "hidden", "head"}


def test_kfac_on_haiku_model(haiku_setup):
    _, _, model, variables, x = haiku_setup
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 3)
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)
    kfac.invert(add=1.0, multiply=1.0)
    p = kfac.posterior_params(jax.random.PRNGKey(2))
    out, _ = model.apply({"params": p, "batch_stats": {}}, x)
    assert bool(jnp.isfinite(out).all())


def test_haiku_param_grads_match_direct(haiku_setup):
    from curvature_tpu.estimators.capture import (collect,
                                                  softmax_cross_entropy)
    from curvature_tpu.nn.core import param_matrix
    transformed, hk_params, model, variables, x = haiku_setup
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    cap = collect(model, model.metas, variables, x, labels=labels)

    def loss_fn(params):
        return softmax_cross_entropy(transformed.apply(params, None, x),
                                     labels)

    grads = jax.grad(loss_fn)(hk_params)
    expected = param_matrix(model.metas["hidden"],
                            {"kernel": grads["hidden"]["w"],
                             "bias": grads["hidden"]["b"]})
    np.testing.assert_allclose(np.asarray(cap.param_grads["hidden"][0]),
                               np.asarray(expected), rtol=1e-5, atol=1e-7)
