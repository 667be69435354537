"""Blocked-G KFAC for vocab-scale heads (estimators/kfac.py g_block_size).

Dense layers whose out_features exceed max_factor_dim get a block-diagonal
G factor (blocks share the layer's A). Validated against the DENSE KFAC on
the same model at reduced vocab: the blocked factors must equal the dense
G's diagonal blocks exactly, and every posterior quantity must equal the
analytic block-diagonal construction assembled densely in numpy.

The reference cannot represent this at all — its KFAC materializes the
full [out, out] G (curvatures.py:340-350), which at GPT-2's 50,257-dim
lm_head would be a 10 GB factor; this layout is what makes `--layers last`
Laplace on a real-vocab LM tractable (VERDICT r4 item 3).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models

ADD, MULT = 0.7, 3.0
OUT = 37          # "vocab" of the oversized head
IN = 5
MFD = 16          # forced max_factor_dim so OUT counts as oversized
BS = 10           # block size -> nb=4, padded=40, pad=3


@pytest.fixture(scope="module")
def problem():
    model = models.mlp([7], OUT)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, IN))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, OUT)
    dense = estimators.KFAC(model, variables)
    dense.update(x, labels=labels)
    blocked = estimators.KFAC(model, variables, max_factor_dim=MFD,
                              g_block_size=BS)
    blocked.update(x, labels=labels)
    return model, variables, x, labels, dense, blocked


def test_head_is_blocked_trunk_is_dense(problem):
    *_, blocked = problem
    meta = blocked.metas["fc2"]
    assert blocked._is_gblock("fc2", meta)
    assert blocked.state["fc2"]["g"].shape == (4, BS, BS)
    assert blocked.state["fc1"]["g"].ndim == 2          # under the limit


def test_blocked_factors_equal_dense_diagonal_blocks(problem):
    *_, dense, blocked = problem
    g_dense = np.asarray(dense.state["fc2"]["g"])
    g_blk = np.asarray(blocked.state["fc2"]["g"])
    padded = np.zeros((4 * BS, 4 * BS), np.float32)
    padded[:OUT, :OUT] = g_dense
    for k in range(4):
        np.testing.assert_allclose(
            g_blk[k], padded[k * BS:(k + 1) * BS, k * BS:(k + 1) * BS],
            rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(blocked.state["fc2"]["a"]),
                               np.asarray(dense.state["fc2"]["a"]),
                               rtol=1e-6)


def _dense_damped(problem, est):
    """Damped per-side matrices of the blocked fc2 layer, densely."""
    a = np.asarray(est.state["fc2"]["a"])
    g = np.asarray(est.state["fc2"]["g"])
    s, n = np.sqrt(MULT), np.sqrt(ADD)
    a_d = s * (a + a.T) / 2 + n * np.eye(a.shape[-1])
    g_d = s * (g + np.swapaxes(g, -1, -2)) / 2 + n * np.eye(g.shape[-1])
    return a_d, g_d


def test_logdet_matches_dense_block_construction(problem):
    model, variables, x, labels, dense, blocked = problem
    a_d, g_d = _dense_damped(problem, blocked)
    want = 0.0
    # fc2: per-block logdets over the REAL dims only
    pad = 4 * BS - OUT
    lg = sum(np.linalg.slogdet(g_d[k])[1] for k in range(4)) \
        - pad * 0.5 * np.log(ADD)
    want += OUT * np.linalg.slogdet(a_d)[1] + a_d.shape[0] * lg
    # fc1: the plain formula
    a1 = np.asarray(blocked.state["fc1"]["a"])
    g1 = np.asarray(blocked.state["fc1"]["g"])
    s, n = np.sqrt(MULT), np.sqrt(ADD)
    a1d = s * (a1 + a1.T) / 2 + n * np.eye(a1.shape[0])
    g1d = s * (g1 + g1.T) / 2 + n * np.eye(g1.shape[0])
    want += g1.shape[0] * np.linalg.slogdet(a1d)[1] \
        + a1.shape[0] * np.linalg.slogdet(g1d)[1]
    got = blocked.logdet_precision(ADD, MULT)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_quad_and_solve_roundtrip(problem):
    """solve(P v) == v with P v = grad(0.5 * quad_state)(v) — the same
    identity test_influence runs for every other layout."""
    from curvature_tpu.estimators.base import normalize_damping
    from curvature_tpu.ops.matfree import delta_shapes
    *_, blocked = problem
    add, mult = normalize_damping(ADD, MULT, len(blocked.metas))
    rng = np.random.default_rng(0)
    v = {n: jnp.asarray(rng.normal(size=s), jnp.float32)
         for n, s in delta_shapes(blocked.metas).items()}
    pv = jax.grad(
        lambda d: 0.5 * blocked.quad_state(blocked.state, add, mult, d))(v)
    back = blocked.precision_solve(pv, ADD, MULT)
    for n in blocked.metas:
        np.testing.assert_allclose(np.asarray(back[n]), np.asarray(v[n]),
                                   rtol=2e-3, atol=2e-4)


def test_solve_matches_numpy_blockwise(problem):
    *_, blocked = problem
    a_d, g_d = _dense_damped(problem, blocked)
    cols = blocked.metas["fc2"].mat_cols
    rng = np.random.default_rng(1)
    d = rng.normal(size=(OUT, cols)).astype(np.float32)
    blocked.invert(ADD, MULT)
    got = np.asarray(blocked.precision_solve(
        {"fc2": jnp.asarray(d)} | {
            n: jnp.zeros((m.out_features, m.mat_cols), jnp.float32)
            for n, m in blocked.metas.items() if n != "fc2"},
        ADD, MULT)["fc2"])
    dq = np.zeros((4 * BS, cols), np.float32)
    dq[:OUT] = d
    a_inv = np.linalg.inv(a_d)
    want = np.concatenate(
        [np.linalg.inv(g_d[k]) @ dq[k * BS:(k + 1) * BS] @ a_inv
         for k in range(4)])[:OUT]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_single_block_sampling_equals_dense(problem):
    """g_block_size >= out -> one unpadded block; with the same key the
    blocked sampler must reproduce the dense sampler bit-for-bit (the
    threefry draw has identical flat layout)."""
    model, variables, x, labels, dense, _ = problem
    one = estimators.KFAC(model, variables, max_factor_dim=MFD,
                          g_block_size=OUT + 5)
    one.update(x, labels=labels)
    assert one.state["fc2"]["g"].shape == (1, OUT, OUT)
    dense.invert(ADD, MULT)
    one.invert(ADD, MULT)
    key = jax.random.PRNGKey(7)
    np.testing.assert_allclose(np.asarray(one.sample(key)["fc2"]),
                               np.asarray(dense.sample(key)["fc2"]),
                               rtol=1e-6, atol=1e-7)


def test_sampling_covariance_blockwise(problem):
    """Empirical covariance of the blocked sample's rows: within-block
    covariance = damped_G_k^{-1} (x) damped_A^{-1}; cross-block = 0."""
    *_, blocked = problem
    a_d, g_d = _dense_damped(problem, blocked)
    blocked.invert(ADD, MULT)
    n_draws = 4096
    keys = jax.random.split(jax.random.PRNGKey(3), n_draws)
    draws = jax.vmap(
        lambda k: blocked.sample_state(blocked.inv_state, k)["fc2"])(keys)
    flat = np.asarray(draws).reshape(n_draws, -1)      # rows vec'd [out*cols]
    cov = flat.T @ flat / n_draws
    cols = blocked.metas["fc2"].mat_cols
    a_inv = np.linalg.inv(a_d)
    g_inv = np.stack([np.linalg.inv(g_d[k]) for k in range(4)])
    want = np.zeros_like(cov)
    for u in range(OUT):
        for v in range(OUT):
            if u // BS != v // BS:
                continue                                # cross-block zero
            k = u // BS
            want[u * cols:(u + 1) * cols, v * cols:(v + 1) * cols] = \
                g_inv[k][u % BS, v % BS] * a_inv
    scale = np.abs(want).max()
    np.testing.assert_allclose(cov, want, atol=0.08 * scale)


def test_gpt2_vocab_head_chain():
    """gpt2_custom with a forced-small max_factor_dim: last-layer blocked-G
    KFAC update (loss='lm') -> invert -> sample -> marglik, the exact chain
    a real 50,257-vocab gpt2 runs with the default thresholds."""
    from curvature_tpu.eval.marglik import log_marginal_likelihood
    lm = models.gpt2_custom(vocab=43, dim=8, depth=1, heads=2, max_len=6)
    rng = jax.random.PRNGKey(0)
    tok = jax.random.randint(rng, (4, 6), 0, 43)
    variables = lm.init(rng, tok)
    est = estimators.KFAC(lm, variables, loss="lm", layer_filter="last",
                          max_factor_dim=16, g_block_size=16)
    assert list(est.metas) == ["lm_head"]
    est.update(tok, rng=jax.random.PRNGKey(1), num_samples=2)
    assert est.state["lm_head"]["g"].shape == (3, 16, 16)
    est.invert(ADD, MULT)
    draw = est.sample(jax.random.PRNGKey(2))
    assert draw["lm_head"].shape == (43, 8)            # no bias on lm_head
    assert np.isfinite(np.asarray(draw["lm_head"])).all()
    lml = log_marginal_likelihood(est, nll_sum=10.0, add=ADD, multiply=MULT)
    assert np.isfinite(lml)
    ens = est.ensemble_params(jax.random.PRNGKey(4), 3)
    assert ens["lm_head"]["kernel"].shape == (3, 8, 43)


def test_g_block_zero_restores_hard_error(problem):
    model, variables, *_ = problem
    with pytest.raises(ValueError, match="exceeds"):
        estimators.KFAC(model, variables, max_factor_dim=MFD,
                        g_block_size=0)
