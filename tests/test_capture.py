"""Capture engine tests: probe gradients, MC vmapped backwards, the
Gaussian (regression) Fisher path, and data prefetch wrappers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.estimators.capture import (collect, gaussian_nll,
                                              softmax_cross_entropy)


@pytest.fixture(scope="module")
def small():
    model = models.mlp([6], 3)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 4))
    variables = model.init(rng, x)
    return model, variables, x


def test_probe_grads_equal_manual_chain(small):
    """Probe gradient for the LAST layer equals the CE cotangent directly
    (dL/dlogits), since the probe sits on the logits themselves."""
    model, variables, x = small
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    cap = collect(model, model.metas, variables, x, labels=labels)
    logits = cap.logits
    p = jax.nn.softmax(logits)
    onehot = jax.nn.one_hot(labels, 3)
    expected = (p - onehot) / logits.shape[0]
    np.testing.assert_allclose(np.asarray(cap.probe_grads["fc2"][0]),
                               np.asarray(expected), rtol=1e-5, atol=1e-7)


def test_param_grads_equal_jax_grad(small):
    """Matrix-view param grads equal jax.grad of the same loss."""
    model, variables, x = small
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    cap = collect(model, model.metas, variables, x, labels=labels)

    def loss_fn(params):
        out, _ = model.apply({"params": params, "batch_stats": {}}, x,
                             train=True)
        return softmax_cross_entropy(out, labels)

    grads = jax.grad(loss_fn)(variables["params"])
    from curvature_tpu.nn.core import param_matrix
    for name, meta in model.metas.items():
        expected = param_matrix(meta, grads[name])
        np.testing.assert_allclose(np.asarray(cap.param_grads[name][0]),
                                   np.asarray(expected), rtol=1e-5, atol=1e-7)


def test_gaussian_fisher_param_grads(small):
    """Regression path: param grads match jax.grad of the Gaussian NLL."""
    model, variables, x = small
    targets = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    cap = collect(model, model.metas, variables, x, labels=targets,
                  loss="gaussian")

    def loss_fn(params):
        out, _ = model.apply({"params": params, "batch_stats": {}}, x,
                             train=True)
        return gaussian_nll(out, targets)

    grads = jax.grad(loss_fn)(variables["params"])
    from curvature_tpu.nn.core import param_matrix
    for name, meta in model.metas.items():
        expected = param_matrix(meta, grads[name])
        np.testing.assert_allclose(np.asarray(cap.param_grads[name][0]),
                                   np.asarray(expected), rtol=1e-5, atol=1e-6)


def test_gaussian_estimator_end_to_end(small):
    """Full regression-Fisher lifecycle on all estimator families
    (the reference only implements the classification path)."""
    model, variables, x = small
    rng = jax.random.PRNGKey(0)
    diag = estimators.Diagonal(model, variables, loss="gaussian")
    diag.update(x, rng=rng, num_samples=4)
    diag.invert(1.0, 10.0)
    kfac = estimators.KFAC(model, variables, loss="gaussian")
    kfac.update(x, rng=rng, num_samples=4)
    kfac.invert(1.0, 10.0)
    s = kfac.sample(jax.random.PRNGKey(1))
    assert all(bool(jnp.isfinite(v).all()) for v in s.values())
    efb = estimators.EFB(model, variables, kfac.state, loss="gaussian")
    efb.update(x, rng=rng, num_samples=4)
    efb.invert(1.0, 10.0)
    assert all(bool(jnp.isfinite(v).all())
               for v in efb.inv_state["ilam"].values())


def test_prefetch_wrappers(small):
    from curvature_tpu.data import CachedLoader, DevicePrefetcher
    rng = np.random.default_rng(0)
    batches = [(rng.standard_normal((4, 3)).astype(np.float32),
                rng.integers(0, 2, 4).astype(np.int32)) for _ in range(5)]
    cached = CachedLoader(iter(batches))
    assert len(cached) == 5
    out1 = [(x.copy(), y.copy()) for x, y in cached]
    out2 = list(cached)  # second epoch served from RAM
    np.testing.assert_array_equal(out1[0][0], np.asarray(out2[0][0]))

    pf = DevicePrefetcher(batches, depth=2)
    got = list(pf)
    assert len(got) == 5
    for (gx, gy), (bx, by) in zip(got, batches):
        np.testing.assert_allclose(np.asarray(gx), bx)
        np.testing.assert_array_equal(np.asarray(gy), by)


def test_parallel_decode_loader(tmp_path):
    from PIL import Image
    from curvature_tpu.data.loaders import ImageFolderLoader
    from curvature_tpu.data import ParallelDecodeLoader
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            arr = rng.integers(0, 255, (12, 12, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    base = ImageFolderLoader(str(tmp_path), img_size=8, batch_size=4)
    seq = [(x.copy(), y.copy()) for x, y in base]
    par = list(ParallelDecodeLoader(
        ImageFolderLoader(str(tmp_path), img_size=8, batch_size=4),
        workers=2))
    assert len(par) == len(seq)
    for (sx, sy), (px, py) in zip(seq, par):
        np.testing.assert_allclose(sx, px)
        np.testing.assert_array_equal(sy, py)


def test_bf16_compute_factor_accuracy(small):
    """bfloat16 forward/backward with f32 accumulation stays within ~1%% of
    the f32 factors (the MXU-native compute path)."""
    model, variables, x = small
    labels = jnp.array([[0, 1, 2, 0, 1, 2, 0, 1]])
    f32 = estimators.KFAC(model, variables)
    f32.update(x, labels=labels)
    bf16 = estimators.KFAC(model, variables, compute_dtype=jnp.bfloat16)
    bf16.update(x, labels=labels)
    for name in f32.state:
        a32 = np.asarray(f32.state[name]["a"])
        a16 = np.asarray(bf16.state[name]["a"])
        scale = np.abs(a32).max() + 1e-8
        assert np.abs(a16 - a32).max() / scale < 2e-2, name


def test_remat_capture_matches(small):
    """jax.checkpoint rematerialization changes memory, not results."""
    model, variables, x = small
    labels = jnp.array([[0, 1, 2, 0, 1, 2, 0, 1]])
    base = collect(model, model.metas, variables, x, labels=labels)
    re = collect(model, model.metas, variables, x, labels=labels, remat=True)
    for name in model.metas:
        np.testing.assert_allclose(np.asarray(re.param_grads[name]),
                                   np.asarray(base.param_grads[name]),
                                   rtol=1e-5, atol=1e-7)
