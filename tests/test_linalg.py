"""ops.linalg unit tests against numpy/scipy (SURVEY.md section 7, M0)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu.ops import (chol_inv, damped_inverse_cholesky, diag_add,
                               eigh_sym, group_by_shape, kron, sym)
from curvature_tpu.ops.linalg import ungroup


@pytest.fixture
def spd(rng):
    a = rng.standard_normal((6, 6)).astype(np.float32)
    return a @ a.T / 6 + np.eye(6, dtype=np.float32)


def test_kron_matches_numpy(rng):
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((2, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(kron(jnp.asarray(a), jnp.asarray(b))),
                               np.kron(a, b), rtol=1e-6)


def test_kron_doctest_example():
    out = kron(jnp.array([[1., 2.], [3., 4.]]),
               jnp.array([[0., 5.], [6., 7.]]))
    np.testing.assert_array_equal(
        np.asarray(out),
        [[0, 5, 0, 10], [6, 7, 12, 14], [0, 15, 0, 20], [18, 21, 24, 28]])


def test_sym_and_diag_add(rng):
    a = rng.standard_normal((4, 4)).astype(np.float32)
    s = np.asarray(sym(jnp.asarray(a)))
    np.testing.assert_allclose(s, (a + a.T) / 2, rtol=1e-6)
    d = np.asarray(diag_add(jnp.asarray(a), 2.5))
    np.testing.assert_allclose(d, a + 2.5 * np.eye(4), rtol=1e-6)


def test_eigh_sym_uses_doubled_operand(spd):
    """eigh_sym decomposes A + A^T (the reference's exact operand,
    utils.py:56-58): eigenvalues are doubled, eigenvectors unchanged."""
    w, v = eigh_sym(jnp.asarray(spd))
    w_ref, v_ref = np.linalg.eigh(spd + spd.T)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(v)), np.abs(v_ref),
                               rtol=1e-3, atol=1e-4)


def test_chol_inv(spd):
    l = np.asarray(chol_inv(jnp.asarray(spd)))
    np.testing.assert_allclose(l @ l.T, np.linalg.inv(spd), rtol=1e-3,
                               atol=1e-5)
    assert np.allclose(l, np.tril(l))  # lower triangular


def test_chol_inv_batched(rng):
    mats = []
    for _ in range(3):
        a = rng.standard_normal((5, 5)).astype(np.float32)
        mats.append(a @ a.T / 5 + np.eye(5, dtype=np.float32))
    stacked = jnp.asarray(np.stack(mats))
    out = np.asarray(chol_inv(stacked))
    for i, m in enumerate(mats):
        np.testing.assert_allclose(out[i] @ out[i].T, np.linalg.inv(m),
                                   rtol=1e-3, atol=1e-5)


def test_damped_inverse_cholesky_split_damping(spd):
    """chol(inv(sqrt(m)*F + sqrt(a)*I)) — the KFAC split-damping operand
    (curvatures.py:368-379)."""
    out = np.asarray(damped_inverse_cholesky(jnp.asarray(spd), 0.25, 4.0))
    reg = np.sqrt(4.0) * spd + np.sqrt(0.25) * np.eye(6)
    expected = np.linalg.inv((reg + reg.T) / 2)
    np.testing.assert_allclose(out @ out.T, expected, rtol=1e-3, atol=1e-5)


def test_group_by_shape_roundtrip(rng):
    arrays = {
        "a": jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32)),
        "c": jnp.asarray(rng.standard_normal((5, 2)).astype(np.float32)),
    }
    groups = group_by_shape(arrays)
    shapes = sorted(tuple(g[1].shape) for g in groups)
    assert shapes == [(1, 5, 2), (2, 3, 3)]
    back = ungroup(groups)
    for k in arrays:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(arrays[k]))


def test_grouped_gram_packed_matches_naive():
    """MXU-tile packing of per-group Grams is exact: ResNeXt-like (g=32,
    c=37 -> 3 groups/tile with padding to 33), depthwise-like (g=24, c=10
    -> 12 groups/tile), an indivisible odd case (g=5, c=50), and the
    no-packing fallbacks (c >= lane; g=1)."""
    from curvature_tpu.ops.linalg import grouped_gram_packed

    rng = np.random.default_rng(0)
    for g, c in ((32, 37), (24, 10), (5, 50), (3, 130), (1, 7)):
        t = jnp.asarray(rng.standard_normal((41, g, c)), jnp.float32)
        naive = jnp.einsum("ngi,ngj->gij", t, t,
                           preferred_element_type=jnp.float32)
        packed = grouped_gram_packed(t, jnp.float32)
        assert packed.shape == (g, c, c)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(naive),
                                   rtol=1e-5, atol=1e-5)
