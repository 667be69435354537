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
    assert not corr_gram_supported((3, 3), (1, 1), groups=4)
