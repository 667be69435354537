"""flax.linen interop: estimators on an unmodified flax model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators
from curvature_tpu.nn.flax_adapter import from_flax

fnn = pytest.importorskip("flax.linen")


class FlaxCNN(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        x = fnn.Conv(4, (3, 3), padding="SAME", name="conv1")(x)
        x = fnn.relu(x)
        x = fnn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = fnn.Dense(16, name="hidden")(x)
        x = fnn.relu(x)
        return fnn.Dense(3, name="head")(x)


@pytest.fixture(scope="module")
def flax_setup():
    fmodel = FlaxCNN()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 8, 8, 2))
    fvars = fmodel.init(rng, x)
    model, variables = from_flax(fmodel, fvars, x)
    return fmodel, fvars, model, variables, x


def test_forward_matches_flax(flax_setup):
    fmodel, fvars, model, variables, x = flax_setup
    expected = fmodel.apply(fvars, x)
    out, aux = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-6)
    assert set(model.metas) == {"conv1", "hidden", "head"}
    assert model.metas["conv1"].kind == "conv"


def test_kfac_on_flax_model(flax_setup):
    _, _, model, variables, x = flax_setup
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 3)
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)
    assert set(kfac.state) == {"conv1", "hidden", "head"}
    kfac.invert(add=1.0, multiply=1.0)
    p = kfac.posterior_params(jax.random.PRNGKey(2))
    out, _ = model.apply({"params": p, "batch_stats": {}}, x)
    assert bool(jnp.isfinite(out).all())


def test_flax_param_grads_match_direct(flax_setup):
    """Capture through the adapter equals jax.grad on the raw flax model."""
    from curvature_tpu.estimators.capture import (collect,
                                                  softmax_cross_entropy)
    from curvature_tpu.nn.core import param_matrix
    fmodel, fvars, model, variables, x = flax_setup
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    cap = collect(model, model.metas, variables, x, labels=labels)

    def loss_fn(params):
        return softmax_cross_entropy(fmodel.apply({"params": params}, x),
                                     labels)

    grads = jax.grad(loss_fn)(fvars["params"])
    expected = param_matrix(model.metas["hidden"],
                            {"kernel": grads["hidden"]["kernel"],
                             "bias": grads["hidden"]["bias"]})
    np.testing.assert_allclose(np.asarray(cap.param_grads["hidden"][0]),
                               np.asarray(expected), rtol=1e-5, atol=1e-7)


def test_diag_and_efb_on_flax(flax_setup):
    _, _, model, variables, x = flax_setup
    labels = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 3)
    diag = estimators.Diagonal(model, variables)
    diag.update(x, labels=labels)
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    inf = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    inf.update(rank=10)
    inf.invert(add=10.0, multiply=10.0)
    s = inf.sample(jax.random.PRNGKey(4))
    assert all(bool(jnp.isfinite(v).all()) for v in s.values())
