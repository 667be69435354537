"""Mixture-of-experts layer (nn.MoE) and per-expert curvature factors.

The MoE layer registers its experts as ``stacked=E, moe=True`` metas with
mask-routed per-expert activation streams, so every estimator's stacked
factor math yields the per-expert masked statistics with no estimator
changes. The reference has no MoE support of any kind.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import curvature_tpu.nn as nn
from curvature_tpu import estimators, models, parallel


class _MoENet(nn.Module):
    def __init__(self, experts, hidden=None, activation=None):
        self.name = None
        self.inp = nn.Dense(16, name="inp")
        self.moe = nn.MoE(16, experts, hidden=hidden, activation=activation,
                          name="moe")
        self.head = nn.Dense(5, name="head")

    def __call__(self, ctx, x):
        h = jax.nn.relu(self.inp(ctx, x))
        h = self.moe(ctx, h)
        return self.head(ctx, h)


class _DenseNet(nn.Module):
    """Same trunk with a plain bias-free Dense instead of the MoE."""

    def __init__(self):
        self.name = None
        self.inp = nn.Dense(16, name="inp")
        self.fc = nn.Dense(16, use_bias=False, name="moe")
        self.head = nn.Dense(5, name="head")

    def __call__(self, ctx, x):
        h = jax.nn.relu(self.inp(ctx, x))
        h = self.fc(ctx, h)
        return self.head(ctx, h)


def _build(experts, hidden=None, seed=0, batch=16):
    model = nn.Model(_MoENet(experts, hidden=hidden))
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (batch, 8))
    variables = model.init(jax.random.PRNGKey(seed), x)
    labels = jax.random.randint(jax.random.PRNGKey(seed + 2), (2, batch),
                                0, 5)
    return model, variables, x, labels


def _routing(variables, x):
    """Recompute the layer's routing decision outside the model."""
    p = variables["params"]
    h = jax.nn.relu(x @ p["inp"]["kernel"] + p["inp"]["bias"])
    probs = jax.nn.softmax(h @ p["moe.router"]["kernel"], axis=-1)
    return h, np.asarray(jnp.argmax(probs, axis=-1)), np.asarray(probs)


def test_moe_forward_matches_manual_routing():
    model, variables, x, _ = _build(experts=4)
    logits, _ = model.apply(variables, x)
    h, top, probs = _routing(variables, x)
    k = np.asarray(variables["params"]["moe"]["kernel"])   # [E, F, O]
    hn = np.asarray(h)
    y = np.stack([probs[n, top[n]] * (hn[n] @ k[top[n]])
                  for n in range(x.shape[0])])
    p = variables["params"]
    ref = y @ np.asarray(p["head"]["kernel"]) + np.asarray(p["head"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-5, atol=1e-6)


def test_single_expert_equals_dense():
    """E=1: softmax over one logit routes everything with gate 1.0, so the
    MoE is exactly a bias-free Dense — forward, KFAC, and Diagonal."""
    model, variables, x, labels = _build(experts=1)
    dense = nn.Model(_DenseNet())
    v_dense = dense.init(jax.random.PRNGKey(9), x)
    p = dict(variables["params"])
    v_dense = {"params": {
        "inp": p["inp"], "head": p["head"],
        "moe": {"kernel": p["moe"]["kernel"][0]},
    }, "batch_stats": {}}

    la, _ = model.apply(variables, x)
    lb, _ = dense.apply(v_dense, x)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-5, atol=1e-6)

    ka = estimators.KFAC(model, variables)
    ka.update(x, labels=labels)
    kb = estimators.KFAC(dense, v_dense)
    kb.update(x, labels=labels)
    np.testing.assert_allclose(np.asarray(ka.state["moe"]["a"][0]),
                               np.asarray(kb.state["moe"]["a"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ka.state["moe"]["g"][0]),
                               np.asarray(kb.state["moe"]["g"]),
                               rtol=1e-5, atol=1e-6)

    da = estimators.Diagonal(model, variables)
    da.update(x, labels=labels)
    db = estimators.Diagonal(dense, v_dense)
    db.update(x, labels=labels)
    np.testing.assert_allclose(np.asarray(da.state["moe"][0]),
                               np.asarray(db.state["moe"]),
                               rtol=1e-5, atol=1e-6)


def test_expert_a_factors_sum_to_dense_gram():
    """Top-1 masks partition the tokens, so sum_e A_e == the unmasked
    activation Gram (each token's aa^T lands in exactly one expert)."""
    model, variables, x, labels = _build(experts=4)
    est = estimators.KFAC(model, variables)
    est.update(x, labels=labels)
    a = np.asarray(est.state["moe"]["a"])                  # [E, F, F]
    h, top, _ = _routing(variables, x)
    hn = np.asarray(h)
    num_mc = 2                         # A accumulates num_mc * Gram per update
    dense_gram = num_mc * hn.T @ hn / hn.shape[0]
    np.testing.assert_allclose(a.sum(axis=0), dense_gram,
                               rtol=1e-5, atol=1e-6)
    # and each expert's block is exactly its routed tokens' Gram
    for e in range(4):
        sel = hn[top == e]
        blk = (num_mc * sel.T @ sel / hn.shape[0]) if len(sel) \
            else np.zeros_like(a[e])
        np.testing.assert_allclose(a[e], blk, rtol=1e-5, atol=1e-6)


def test_moe_two_layer_experts_and_lifecycle():
    """hidden= gives Switch-style two-layer experts: two tracked metas,
    full update -> invert -> sample -> posterior apply lifecycle."""
    model, variables, x, labels = _build(experts=4, hidden=32)
    est = estimators.KFAC(model, variables)
    assert est.metas["moe.fc1"].stacked == 4 and est.metas["moe.fc1"].moe
    assert est.metas["moe.fc2"].fan_in == 32
    est.update(x, labels=labels)
    for lname in ("moe.fc1", "moe.fc2"):
        assert est.state[lname]["a"].shape[0] == 4
        assert bool(jnp.all(jnp.isfinite(est.state[lname]["a"])))
    est.invert(add=1.0, multiply=10.0)
    new_params = est.posterior_params(jax.random.PRNGKey(3))
    logits, _ = model.apply({"params": new_params, "batch_stats": {}}, x)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # sampled offsets only touch expert kernels [E, F, O]
    assert new_params["moe.fc1"]["kernel"].shape == (4, 16, 32)


def test_moe_nonzero_activation_stays_masked():
    """act(0) != 0 activations (sigmoid) must NOT leak unrouted tokens into
    fc2's A factor: the routing mask is re-applied after the activation."""
    model = nn.Model(_MoENet(2, hidden=8, activation=jax.nn.sigmoid))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    variables = model.init(jax.random.PRNGKey(0), x)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 5)
    est = estimators.KFAC(model, variables)
    est.update(x, labels=labels)

    h, top, _ = _routing(variables, x)
    hn = np.asarray(h)
    k1 = np.asarray(variables["params"]["moe.fc1"]["kernel"])  # [2, 16, 8]
    a = np.asarray(est.state["moe.fc2"]["a"])                  # [2, 8, 8]
    num_mc = 2
    for e in range(2):
        m = (top == e).astype(np.float32)[:, None]
        he = 1.0 / (1.0 + np.exp(-(hn * m) @ k1[e])) * m       # masked sigmoid
        np.testing.assert_allclose(a[e], num_mc * he.T @ he / hn.shape[0],
                                   rtol=1e-5, atol=1e-6)


def test_efb_on_moe():
    model, variables, x, labels = _build(experts=2)
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    assert efb.state["moe"].shape[0] == 2
    efb.invert(add=1.0, multiply=10.0)
    s = efb.sample(jax.random.PRNGKey(4))
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in s.values())


def test_expert_parallel_sharding_matches_single_device():
    """ep: the 'expert' mesh axis shards expert params and per-expert
    factor state; factors equal the single-device run exactly."""
    model, variables, x, labels = _build(experts=4)
    ref = estimators.KFAC(model, variables)
    ref.update(x, labels=labels)

    mesh = parallel.make_mesh({"expert": 2, "data": 4})
    sh = estimators.KFAC(model, variables).use_mesh(mesh)
    sh.update(x, labels=labels)
    for key in ("a", "g"):
        np.testing.assert_allclose(np.asarray(sh.state["moe"][key]),
                                   np.asarray(ref.state["moe"][key]),
                                   rtol=1e-5, atol=1e-6)
    assert sh.state["moe"]["g"].sharding.spec[0] == "expert"
    # non-MoE layers stay replicated
    assert all(s is None for s in sh.state["head"]["g"].sharding.spec)
    sh.invert(add=1.0, multiply=10.0)
    s = sh.sample(jax.random.PRNGKey(5))
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in s.values())


def test_gpt2_moe_lm_chain():
    """Per-token Fisher on the Switch-style GPT-2: update -> invert ->
    sample over a mixed stack of attention Dense layers and MoE experts."""
    model = models.gpt2_moe_tiny(num_classes=32, experts=4, max_len=8)
    toks = jax.random.randint(jax.random.PRNGKey(0), (4, 8), 0, 32)
    variables = model.init(jax.random.PRNGKey(1), toks)
    est = estimators.KFAC(model, variables, loss="lm")
    est.update(toks, rng=jax.random.PRNGKey(2), num_samples=2)
    assert est.state["h.0.moe.fc1"]["a"].shape == (4, 64, 64)
    assert all(bool(jnp.all(jnp.isfinite(v)))
               for fac in est.state.values() for v in fac.values())
    est.invert(add=1.0, multiply=10.0)
    new_params = est.posterior_params(jax.random.PRNGKey(3))
    logits, _ = model.apply({"params": new_params, "batch_stats": {}}, toks)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_top2_routing_forward_and_factors():
    """GShard-style top-2: each token feeds its two best experts, each
    scaled by its router probability; per-expert A factors are the Grams
    over exactly the tokens that reached each expert."""
    model = nn.Model(_MoENet(4))
    model.root.moe.top_k = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    variables = model.init(jax.random.PRNGKey(0), x)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 5)

    logits, _ = model.apply(variables, x)
    h, _, probs = _routing(variables, x)
    hn, k = np.asarray(h), np.asarray(variables["params"]["moe"]["kernel"])
    top2 = np.argsort(-probs, axis=-1)[:, :2]
    y = np.stack([sum(probs[n, e] * (hn[n] @ k[e]) for e in top2[n])
                  for n in range(16)])
    pp = variables["params"]
    ref = y @ np.asarray(pp["head"]["kernel"]) + np.asarray(
        pp["head"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-5,
                               atol=1e-6)

    est = estimators.KFAC(model, variables)
    est.update(x, labels=labels)
    a = np.asarray(est.state["moe"]["a"])
    for e in range(4):
        sel = hn[[e in top2[n] for n in range(16)]]
        np.testing.assert_allclose(a[e], 2 * sel.T @ sel / 16,
                                   rtol=1e-5, atol=1e-6)


def test_kfac_natural_gradient_training_on_moe():
    """The KFAC natural-gradient optimizer preconditions per-expert blocks
    through the same stacked inverse path (training --optimizer kfac)."""
    import optax
    from curvature_tpu import optim
    model, variables, x, _ = _build(experts=2)
    y = jnp.asarray(np.random.RandomState(0).randint(0, 5, 16))
    tx = optax.sgd(0.05)
    kstep, kinit = optim.make_kfac_train_step(model, estimators.KFAC(
        model, variables), tx, damping=0.1)
    factors, inv = kinit(variables, x, y, jax.random.PRNGKey(1))
    p0 = variables["params"]
    out = kstep(p0, tx.init(p0), factors, inv, {},
                jnp.zeros((), jnp.int32), x, y, jax.random.PRNGKey(2))
    assert np.isfinite(float(out[-1]))
    new_kernel = out[0]["moe"]["kernel"]
    assert new_kernel.shape == (2, 16, 16)
    assert bool(jnp.all(jnp.isfinite(new_kernel)))


def test_moe_bf16_compute_dtype():
    """bfloat16 compute path through the MoE dispatch (token ids stay int;
    factors accumulate f32-finite)."""
    model = models.gpt2_moe_tiny(num_classes=32, experts=2, max_len=8)
    toks = jax.random.randint(jax.random.PRNGKey(0), (4, 8), 0, 32)
    variables = model.init(jax.random.PRNGKey(1), toks)
    est = estimators.KFAC(model, variables, loss="lm",
                          compute_dtype=jnp.bfloat16)
    est.update(toks, rng=jax.random.PRNGKey(2), num_samples=1)
    assert all(bool(jnp.all(jnp.isfinite(v)))
               for fac in est.state.values() for v in fac.values())
    assert est.state["h.0.moe.fc1"]["a"].dtype == jnp.float32


def test_moe_inside_scanblocks_raises():
    class _Body(nn.Module):
        def __init__(self, prefix):
            self.name = prefix
            self.moe = nn.MoE(8, 2, name=f"{prefix}.moe")

        def __call__(self, ctx, x):
            return self.moe(ctx, x)

    model = nn.Model(nn.ScanBlocks(lambda p: _Body(p), depth=2, name="blk"))
    with pytest.raises(ValueError, match="already-stacked"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 8)))
