"""Correlation patch-Gram (ops/corr_gram.py) — exactness vs the unfold
Gram across paddings, kernel sizes, bias, dtypes, and ragged shapes.

The formulation collapses the k^4 tap-pair products onto (2k-1)^2 windowed
channel correlations with exact single-row/column/corner boundary
corrections; any indexing error shows up as a boundary-localized mismatch,
so the asymmetric-padding and VALID cases are the load-bearing ones.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import nn
from curvature_tpu.ops.corr_gram import corr_gram_supported, corr_patch_gram
from curvature_tpu.ops.patches import extract_patches


def _unfold_gram(x, ks, pad, bias):
    c = x.shape[-1]
    p = extract_patches(x, ks, (1, 1), pad).reshape(-1, c * ks[0] * ks[1])
    if bias:
        p = jnp.concatenate([p, jnp.ones((p.shape[0], 1), p.dtype)], axis=1)
    return np.asarray(jnp.einsum("ni,nj->ij", p, p,
                                 preferred_element_type=jnp.float32))


@pytest.mark.parametrize("shape,ks,pad,bias", [
    ((8, 8, 3), (3, 3), ((1, 1), (1, 1)), True),
    ((8, 8, 3), (3, 3), ((1, 1), (1, 1)), False),
    ((9, 7, 4), (3, 3), "SAME", True),
    ((10, 10, 2), (5, 5), ((2, 2), (2, 2)), True),
    ((8, 8, 3), (3, 3), "VALID", True),
    ((12, 12, 5), (3, 3), ((0, 2), (2, 0)), True),
    ((7, 11, 3), (1, 3), ((0, 0), (1, 1)), True),
    # output extent < k-1: the row/col boundary-candidate ranges OVERLAP
    # and a duplicated index double-subtracts its correction (the confirmed
    # round-5 review bug — these two cases fail with rel-err 1.6 / 0.40
    # without the set-union dedupe)
    ((3, 3, 2), (3, 3), "VALID", True),
    ((3, 8, 2), (5, 5), ((2, 2), (2, 2)), True),
])
def test_corr_gram_matches_unfold(shape, ks, pad, bias):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4,) + shape), jnp.float32)
    want = _unfold_gram(x, ks, pad, bias)
    got = np.asarray(corr_patch_gram(x, ks, pad, has_bias=bias))
    np.testing.assert_allclose(got, want,
                               atol=2e-5 * max(np.abs(want).max(), 1.0))


def test_corr_gram_bf16_operands():
    """bf16 operands, f32 accumulation — same contract as the einsum path."""
    rng = np.random.default_rng(1)
    xf = jnp.asarray(rng.standard_normal((4, 8, 8, 3)), jnp.float32)
    x = xf.astype(jnp.bfloat16)
    want = _unfold_gram(x.astype(jnp.float32), (3, 3), ((1, 1), (1, 1)),
                        True)
    got = np.asarray(corr_patch_gram(x, (3, 3), ((1, 1), (1, 1))))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want,
                               atol=2e-2 * max(np.abs(want).max(), 1.0))


def test_supported_gate():
    assert corr_gram_supported((3, 3), (1, 1))
    assert not corr_gram_supported((3, 3), (2, 2))      # strided
    assert not corr_gram_supported((1, 1), (1, 1))      # no taps to share
    assert corr_gram_supported((3, 3), (1, 1), groups=4)


# ---------------------------------------------------- grouped variant
def _grouped_unfold_gram(x, ks, pad, bias, groups):
    c = x.shape[-1]
    fg = (c // groups) * ks[0] * ks[1]
    p = extract_patches(x, ks, (1, 1), pad).reshape(-1, groups, fg)
    if bias:
        ones = jnp.ones(p.shape[:-1] + (1,), p.dtype)
        p = jnp.concatenate([p, ones], axis=-1)
    return np.asarray(jnp.einsum("ngi,ngj->gij", p, p,
                                 preferred_element_type=jnp.float32))


@pytest.mark.parametrize("shape,ks,pad,bias,groups", [
    ((8, 8, 8), (3, 3), ((1, 1), (1, 1)), True, 4),
    ((8, 8, 8), (3, 3), "SAME", False, 2),
    ((9, 7, 6), (3, 3), "VALID", True, 6),      # depthwise (cg=1)
    ((10, 10, 4), (5, 5), ((2, 2), (2, 2)), True, 2),
])
def test_corr_gram_grouped_matches_unfold(shape, ks, pad, bias, groups):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4,) + shape), jnp.float32)
    want = _grouped_unfold_gram(x, ks, pad, bias, groups)
    got = np.asarray(corr_patch_gram(x, ks, pad, has_bias=bias,
                                     groups=groups))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want,
                               atol=2e-5 * max(np.abs(want).max(), 1.0))


# ------------------------------------------------- KFAC integration parity
class _ConvNet(nn.Module):
    """stride-1 3x3 (corr-eligible) -> strided 3x3 -> 1x1 -> fc: the
    non-eligible layers pin that the dispatch gate only reroutes the
    stride-1 non-1x1 conv."""

    def __init__(self):
        self.c1 = nn.Conv(8, 3, padding=1, name="c1")
        self.c2 = nn.Conv(8, 3, strides=2, padding=1, name="c2")
        self.c3 = nn.Conv(8, 1, name="c3")
        self.fc = nn.Dense(5, name="fc")

    def __call__(self, ctx, x):
        x = nn.ReLU()(ctx, self.c1(ctx, x))
        x = nn.ReLU()(ctx, self.c2(ctx, x))
        x = nn.ReLU()(ctx, self.c3(ctx, x))
        x = nn.Flatten()(ctx, x)
        return self.fc(ctx, x)


@pytest.fixture(scope="module")
def conv_net():
    model = nn.Model(_ConvNet())
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    variables = model.init(jax.random.key(1), x)
    labels = jnp.asarray(
        np.random.default_rng(2).integers(0, 5, size=(2, 4)))
    return model, variables, x, labels


def _kfac_state(conv_net, **kw):
    from curvature_tpu import estimators
    model, variables, x, labels = conv_net
    est = estimators.KFAC(model, variables, **kw)
    est.update(x, labels=labels)
    return est


def _assert_states_match(a, b):
    for name in a.state:
        for fac in a.state[name]:
            np.testing.assert_allclose(
                np.asarray(a.state[name][fac], np.float32),
                np.asarray(b.state[name][fac], np.float32),
                rtol=1e-4, atol=1e-5, err_msg=f"{name}/{fac}")


def test_kfac_corr_gram_full_update_parity(conv_net):
    """Full KFAC update with the correlation A path (gate thresholds
    lowered to hit the tiny test shapes) == the einsum/unfold path."""
    base = _kfac_state(conv_net, corr_gram=False)
    corr = _kfac_state(conv_net, corr_gram=True,
                       corr_gram_min_channels=1, corr_gram_min_extent=1)
    # the gate must actually reroute c1 (and only c1-style layers)
    assert corr._corr_gram_ok(corr.metas["c1"], jnp.zeros((4, 8, 8, 3)))
    assert not corr._corr_gram_ok(corr.metas["c2"], jnp.zeros((4, 8, 8, 3)))
    assert not corr._corr_gram_ok(corr.metas["c3"], jnp.zeros((4, 8, 8, 8)))
    _assert_states_match(base, corr)


def test_kfac_gate_accepts_string_padding(conv_net):
    """'SAME'/'VALID' paddings (adapter-sourced convs) take the corr path
    too — corr_patch_gram resolves them itself, unlike the pallas path."""
    from dataclasses import replace
    from curvature_tpu import estimators
    model, variables, x, labels = conv_net
    est = estimators.KFAC(model, variables, corr_gram=True,
                          corr_gram_min_channels=1, corr_gram_min_extent=1)
    meta_same = replace(est.metas["c1"], padding="SAME")
    assert est._corr_gram_ok(meta_same, jnp.zeros((4, 8, 8, 3)))
    # 7x7 kernels stay off the path (0.5x standalone + unroll blowup risk)
    meta_k7 = replace(est.metas["c1"], kernel_size=(7, 7))
    assert not est._corr_gram_ok(meta_k7, jnp.zeros((4, 8, 8, 3)))
    # and the A factor computed through a string-padding meta matches the
    # explicit-padding one (flax SAME == explicit (1,1) pads at stride 1)
    act = jax.random.normal(jax.random.key(3), (4, 8, 8, 3))
    a_same = np.asarray(est._a_factor(meta_same, act))
    a_expl = np.asarray(est._a_factor(est.metas["c1"], act))
    np.testing.assert_allclose(a_same, a_expl, rtol=1e-5, atol=1e-6)


def test_kfac_default_gate_skips_small_shapes(conv_net):
    """At default thresholds the tiny test conv stays on the base path."""
    est = _kfac_state(conv_net)   # corr_gram=True by default
    assert not est._corr_gram_ok(est.metas["c1"], jnp.zeros((4, 8, 8, 3)))


class _GroupedConvNet(nn.Module):
    """grouped 3x3 stride-1 (corr-grouped-eligible) -> depthwise -> fc."""

    def __init__(self):
        self.c1 = nn.Conv(8, 3, padding=1, groups=4, name="c1")
        self.dw = nn.Conv(8, 3, padding=1, groups=8, name="dw")
        self.fc = nn.Dense(5, name="fc")

    def __call__(self, ctx, x):
        x = nn.ReLU()(ctx, self.c1(ctx, x))
        x = nn.ReLU()(ctx, self.dw(ctx, x))
        x = nn.Flatten()(ctx, x)
        return self.fc(ctx, x)


@pytest.fixture(scope="module")
def grouped_conv_net():
    model = nn.Model(_GroupedConvNet())
    x = jax.random.normal(jax.random.key(4), (4, 8, 8, 4))
    variables = model.init(jax.random.key(5), x)
    labels = jnp.asarray(
        np.random.default_rng(6).integers(0, 5, size=(2, 4)))
    return model, variables, x, labels


def test_kfac_corr_gram_grouped_full_update_parity(grouped_conv_net):
    """Grouped/depthwise corr path (corr_gram_grouped=True) == the grouped
    einsum path on a full KFAC update."""
    base = _kfac_state(grouped_conv_net, corr_gram=False)
    corr = _kfac_state(grouped_conv_net, corr_gram_grouped=True,
                       corr_gram_min_channels=1, corr_gram_min_extent=1)
    _assert_states_match(base, corr)


def test_kfac_stack_grams_full_update_parity(conv_net):
    """Cross-layer Gram stacking (stack_grams=True) == per-layer path."""
    base = _kfac_state(conv_net, corr_gram=False, stack_grams=False)
    stck = _kfac_state(conv_net, corr_gram=False, stack_grams=True)
    _assert_states_match(base, stck)


def test_kfac_corr_gram_sharded_parity(conv_net):
    """corr-path KFAC under a data-sharded mesh == single-device: the
    boundary corrections are per-image, so batch sharding + the factor
    psum stay exact (GSPMD inserts the collectives). The generic sharded
    tests never hit this path — their models sit below the corr gate."""
    from curvature_tpu import estimators, parallel
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    model, variables, x, labels = conv_net
    single = _kfac_state(conv_net, corr_gram=True,
                         corr_gram_min_channels=1, corr_gram_min_extent=1)
    mesh = parallel.make_mesh({"data": 2}, devices=jax.devices()[:2])
    sharded = estimators.KFAC(model, variables, corr_gram=True,
                              corr_gram_min_channels=1,
                              corr_gram_min_extent=1).use_mesh(mesh)
    assert sharded._corr_gram_ok(sharded.metas["c1"], x)
    sharded.update(x, labels=labels)
    _assert_states_match(single, sharded)
