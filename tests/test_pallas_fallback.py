"""Pallas compile-failure fallback (estimators/base.py:_pallas_fallback).

Inside a large fused update program XLA's co-scheduling around a Pallas
custom call can exceed the TPU's 16 MB scoped-vmem limit even though the
identical kernel compiles standalone (observed: ResNet-50 KFAC update at
batch 32, layer2's stride-2 3x3 conv). The estimator must retrace without
its Pallas kernels — the XLA Gram paths are exact equivalents — rather
than surface the backend error. These tests stub the failure (the real
one needs a TPU and a specific fused program) and verify the retry
mechanics and factor exactness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvature_tpu import estimators, models, nn


VMEM_MSG = ("INTERNAL: Mosaic failed to compile TPU kernel: Ran out of "
            "memory in memory space vmem while allocating on stack for "
            "%patch_gram_v2.1 ... custom_call_target=\"tpu_custom_call\"")


def _small_conv_model():
    class Net(nn.Module):
        def __init__(self):
            self.c1 = nn.Conv(8, 3, padding=1, name="c1")
            self.c2 = nn.Conv(8, 3, strides=2, padding=1, name="c2")
            self.fc = nn.Dense(5, name="fc")

        def __call__(self, ctx, x):
            x = nn.ReLU()(ctx, self.c1(ctx, x))
            x = nn.ReLU()(ctx, self.c2(ctx, x))
            return self.fc(ctx, nn.Flatten()(ctx, x))

    return nn.Model(Net())


@pytest.fixture
def setup():
    model = _small_conv_model()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 8, 8, 3), jnp.float32)
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 5)
    return model, variables, x, labels


def _stub_failure(est, attr, calls):
    def boom(*a, **k):
        calls.append(attr)
        raise RuntimeError(VMEM_MSG)
    setattr(est, attr, boom)


def test_update_falls_back_and_matches_xla_path(setup):
    model, variables, x, labels = setup
    ref = estimators.KFAC(model, variables, use_pallas=False)
    ref.update(x, labels=labels)

    est = estimators.KFAC(model, variables, use_pallas=True)
    calls = []
    _stub_failure(est, "_jit_update", calls)
    state = est.update(x, labels=labels)

    assert calls == ["_jit_update"]          # failing wrapper ran once
    assert est.use_pallas is False           # fallback flipped the knob
    for name in ref.state:
        for key in ref.state[name]:
            np.testing.assert_allclose(
                np.asarray(state[name][key]),
                np.asarray(ref.state[name][key]), rtol=1e-6)

    # subsequent updates go straight through the rebuilt wrapper
    est.update(x, labels=labels)
    assert calls == ["_jit_update"]


def test_update_batches_falls_back(setup):
    model, variables, x, labels = setup
    xs = jnp.stack([x, x + 0.1])
    ref = estimators.KFAC(model, variables, use_pallas=False)
    ref.update_batches(xs, rng=jax.random.PRNGKey(2), num_samples=1)

    est = estimators.KFAC(model, variables, use_pallas=True)
    calls = []
    _stub_failure(est, "_jit_update_scan", calls)
    state = est.update_batches(xs, rng=jax.random.PRNGKey(2), num_samples=1)
    assert calls == ["_jit_update_scan"] and est.use_pallas is False
    for name in ref.state:
        np.testing.assert_allclose(np.asarray(state[name]["a"]),
                                   np.asarray(ref.state[name]["a"]),
                                   rtol=1e-6)


def test_fallback_forces_a_genuine_retrace(monkeypatch, setup):
    """jax.jit on the SAME bound method returns the stale trace (the trace
    cache keys on the callable, and bound methods of one instance compare
    equal) — the original fallback resubmitted the exact jaxpr that had
    just failed. The retry must RETRACE so _gram re-reads use_pallas."""
    from curvature_tpu.estimators.base import Estimator
    real = Estimator._step
    traces = []

    def counting(self, *a, **k):
        traces.append(1)
        return real(self, *a, **k)

    monkeypatch.setattr(Estimator, "_step", counting)
    model, variables, x, labels = setup
    est = estimators.KFAC(model, variables, use_pallas=True)
    est.update(x, labels=labels)
    n1 = len(traces)
    assert n1 >= 1
    est.update(x, labels=labels)          # cached program, no new trace
    assert len(traces) == n1

    calls = []
    _stub_failure(est, "_jit_update", calls)
    est.update(x, labels=labels)
    assert est.use_pallas is False
    assert len(traces) > n1               # the retry genuinely retraced


def test_unrelated_errors_are_reraised(setup):
    model, variables, x, labels = setup
    est = estimators.KFAC(model, variables, use_pallas=True)

    def boom(*a, **k):
        raise RuntimeError("some unrelated failure")
    est._jit_update = boom
    with pytest.raises(RuntimeError, match="unrelated"):
        est.update(x, labels=labels)
    assert est.use_pallas is True            # knob untouched


def test_no_fallback_when_pallas_already_off(setup):
    model, variables, x, labels = setup
    est = estimators.KFAC(model, variables, use_pallas=False)

    def boom(*a, **k):
        raise RuntimeError(VMEM_MSG)
    est._jit_update = boom
    with pytest.raises(RuntimeError, match="vmem"):
        est.update(x, labels=labels)


def test_fallback_rebuilds_sharded_wrappers(setup):
    """Under a mesh the retry must go through rebuilt SHARDED wrappers
    (use_mesh is re-run from the remembered args)."""
    from curvature_tpu import parallel
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    model, variables, x, labels = setup
    mesh = parallel.make_mesh({"data": 2}, devices=jax.devices()[:2])

    ref = estimators.KFAC(model, variables, use_pallas=False).use_mesh(mesh)
    ref.update(x, labels=labels)

    est = estimators.KFAC(model, variables, use_pallas=True).use_mesh(mesh)
    calls = []
    _stub_failure(est, "_jit_update_sharded", calls)
    state = est.update(x, labels=labels)
    assert calls == ["_jit_update_sharded"] and est.use_pallas is False
    for name in ref.state:
        np.testing.assert_allclose(np.asarray(state[name]["g"]),
                                   np.asarray(ref.state[name]["g"]),
                                   rtol=1e-6)
