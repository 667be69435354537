"""Pallas kernel validation (interpret mode on CPU) against the XLA path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import LayerMeta
from curvature_tpu.estimators.base import act_tokens
from curvature_tpu.ops.pallas.patch_gram import patch_gram, patch_gram_supported


def _reference_gram(x, kernel_size, padding, strides=(1, 1)):
    meta = LayerMeta("l", "conv", 1, x.shape[-1] * kernel_size[0] * kernel_size[1],
                     True, kernel_size, strides, padding)
    a = act_tokens(meta, x, append_ones=True)
    return np.asarray(jnp.einsum("ni,nj->ij", a, a))


@pytest.mark.parametrize("shape,ks,pad", [
    ((2, 8, 8, 4), (3, 3), ((1, 1), (1, 1))),
    ((3, 10, 6, 8), (3, 3), ((0, 0), (0, 0))),
    ((2, 7, 7, 4), (5, 5), ((2, 2), (2, 2))),
    ((1, 9, 9, 3), (2, 2), ((0, 0), (0, 0))),
])
def test_patch_gram_matches_xla(shape, ks, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    expected = _reference_gram(x, ks, pad)
    got = np.asarray(patch_gram(x, ks, pad, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_patch_gram_supported_gate():
    assert patch_gram_supported(64, (3, 3), (1, 1))
    assert not patch_gram_supported(64, (3, 3), (2, 2))      # strided
    assert not patch_gram_supported(512, (3, 3), (1, 1))     # F too large
    assert not patch_gram_supported(64, (1, 1), (1, 1))      # pointless


@pytest.mark.parametrize("shape,ks,pad", [
    ((2, 8, 8, 4), (3, 3), ((1, 1), (1, 1))),
    ((3, 10, 6, 8), (3, 3), ((0, 0), (0, 0))),
    ((2, 7, 7, 4), (5, 5), ((2, 2), (2, 2))),
])
def test_patch_gram_v2_matches_xla(shape, ks, pad):
    from curvature_tpu.ops.pallas.patch_gram import patch_gram_v2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    expected = _reference_gram(x, ks, pad)
    got = np.asarray(patch_gram_v2(x, ks, pad, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,ks,pad,strides", [
    ((2, 8, 8, 4), (3, 3), ((1, 1), (1, 1)), (2, 2)),
    ((3, 9, 9, 8), (3, 3), ((1, 1), (1, 1)), (2, 2)),   # odd grid
    ((2, 10, 6, 8), (3, 3), ((0, 0), (0, 0)), (2, 2)),
    ((2, 12, 12, 4), (5, 5), ((2, 2), (2, 2)), (2, 2)),
    ((2, 8, 8, 4), (3, 3), "SAME", (2, 2)),     # stride-aware SAME padding
    ((2, 7, 9, 4), (3, 3), "SAME", (2, 2)),     # odd dims: asymmetric SAME
])
def test_patch_gram_v2_strided_matches_xla(shape, ks, pad, strides):
    """Stride-2 windows (ResNet downsampling convs) via the decimation
    reshape."""
    from curvature_tpu.ops.pallas.patch_gram import patch_gram_v2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    expected = _reference_gram(x, ks, pad, strides)
    got = np.asarray(patch_gram_v2(x, ks, pad, strides, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_patch_gram_v2_gate_strides():
    from curvature_tpu.ops.pallas.patch_gram import patch_gram_v2_supported
    assert patch_gram_v2_supported(128, (3, 3), (2, 2), 56, 56)
    assert patch_gram_v2_supported(128, (3, 3), (1, 1), 28, 28)
    assert not patch_gram_v2_supported(128, (3, 3), (3, 3), 28, 28)
    assert not patch_gram_v2_supported(64, (3, 3), (2, 2), 56, 56)  # c gate


def test_kfac_pallas_gate_off_on_cpu():
    """On CPU the auto gate must disable the pallas path (tests run the XLA
    route; the TPU route is A/B-validated on hardware)."""
    import jax as _jax
    from curvature_tpu import estimators, models
    model = models.lenet5()
    x = jnp.zeros((2, 28, 28, 1))
    variables = model.init(_jax.random.PRNGKey(0), x)
    est = estimators.KFAC(model, variables)
    assert est.use_pallas is False


@pytest.mark.parametrize("shape,ks,pad,strides", [
    ((2, 14, 14, 256), (3, 3), ((1, 1), (1, 1)), (1, 1)),  # layer3 F=2305
    ((2, 7, 7, 512), (3, 3), ((1, 1), (1, 1)), (1, 1)),    # layer4 F=4609
    ((2, 16, 16, 64), (3, 3), ((1, 1), (1, 1)), (1, 1)),   # full-F tile
    ((2, 12, 12, 128), (3, 3), ((1, 1), (1, 1)), (2, 2)),  # strided
    ((2, 9, 9, 96), (3, 3), "SAME", (1, 1)),               # odd + SAME
    ((1, 10, 10, 32), (5, 5), ((2, 2), (2, 2)), (1, 1)),   # 5x5 small C
])
def test_patch_gram_tiled_matches_xla(shape, ks, pad, strides):
    from curvature_tpu.ops.pallas.patch_gram import patch_gram_tiled
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    meta = LayerMeta("l", "conv", 1,
                     shape[-1] * ks[0] * ks[1], True, ks, strides, pad)
    a = act_tokens(meta, x, append_ones=True)
    expected = np.asarray(jnp.einsum("ni,nj->ij", a, a))
    got = np.asarray(patch_gram_tiled(x, ks, pad, strides, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4,
                               atol=1e-4 * np.abs(expected).max())


def test_tiled_plan_constraints():
    from curvature_tpu.ops.pallas.patch_gram import tiled_plan
    # kb*C must be a 128-multiple (Mosaic tile constraint)...
    assert tiled_plan(256, (3, 3), (1, 1), 14, 14, 16)[0] == 1
    assert tiled_plan(128, (3, 3), (1, 1), 28, 28, 16)[0] == 3
    # ...or fall back to a single full-F tile for small C
    assert tiled_plan(64, (3, 3), (1, 1), 56, 56, 16)[0] == 9
    # huge-F shapes still plan (that's the point of the tiling)
    assert tiled_plan(512, (3, 3), (1, 1), 7, 7, 16) is not None
    # 1x1 convs are pointless; tiny C unsupported
    assert tiled_plan(256, (1, 1), (1, 1), 14, 14, 16) is None
    assert tiled_plan(3, (7, 7), (2, 2), 224, 224, 16) is None


@pytest.mark.parametrize("n,f", [(784, 4609), (3136, 1025), (700, 577),
                                 (513, 2049), (100, 64)])
def test_sym_gram_matches_einsum(n, f):
    """Lower-triangular-tile Gram == the full einsum (padding rows/cols
    contribute exact zeros; diagonal tiles reconstruct from tril)."""
    from curvature_tpu.ops.pallas.sym_gram import sym_gram
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    want = np.asarray(jnp.einsum("ni,nj->ij", x, x,
                                 preferred_element_type=jnp.float32))
    got = np.asarray(sym_gram(x, interpret=True))
    np.testing.assert_allclose(got, want,
                               atol=2e-5 * max(np.abs(want).max(), 1))
    assert np.allclose(got, got.T)
