"""Golden parity vs the PyTorch reference (BASELINE.json: 1e-5 rtol factors).

Both frameworks see byte-identical weights, inputs and MC labels; factors,
inverses and eigen-corrected moments must agree.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import reference_harness as H

from curvature_tpu import estimators
from curvature_tpu.models.torch_convert import convert_torch_state_dict

B, HH, WW = 8, 6, 6
S = 3  # MC label samples


@pytest.fixture(scope="module")
def setup():
    tmodel = H.tiny_torch_convnet(seed=0)
    jmodel = H.tiny_jax_convnet()
    variables = convert_torch_state_dict(tmodel.state_dict(), H.TINY_KEY_MAP)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    # trace metas
    _ = jmodel.init(jax.random.PRNGKey(0),
                    jnp.zeros((B, HH, WW, 1), jnp.float32))

    rng = np.random.default_rng(42)
    x = rng.standard_normal((B, 1, HH, WW)).astype(np.float32)
    labels = rng.integers(0, 5, size=(S, B))
    tx = torch.from_numpy(x)
    tlabels = torch.from_numpy(labels)
    jx = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    jlabels = jnp.asarray(labels)
    return tmodel, jmodel, variables, tx, tlabels, jx, jlabels


def test_forward_parity(setup):
    tmodel, jmodel, variables, tx, _, jx, _ = setup
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(tx).numpy()
    jout, _ = jmodel.apply(variables, jx)
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-4, atol=1e-5)


def _ours(setup, cls, **kw):
    _, jmodel, variables, _, _, jx, jlabels = setup
    est = cls(jmodel, variables, **kw)
    est.update(jx, labels=jlabels)
    return est


def _theirs(setup, name, **kw):
    tmodel, _, _, tx, tlabels, _, _ = setup
    est = H.run_reference_estimator(name, tmodel, tx, tlabels, B, **kw)
    return est


def test_diagonal_parity(setup):
    ours = _ours(setup, estimators.Diagonal)
    theirs = _theirs(setup, "Diagonal")
    ref = {n: v.detach().numpy()
           for n, v in zip(["conv1", "fc1"], theirs.state.values())}
    for name in ["conv1", "fc1"]:
        np.testing.assert_allclose(np.asarray(ours.state[name]), ref[name],
                                   rtol=1e-5, atol=1e-7)


def test_block_diagonal_parity(setup):
    ours = _ours(setup, estimators.BlockDiagonal)
    theirs = _theirs(setup, "BlockDiagonal")
    ref = {n: v.detach().numpy()
           for n, v in zip(["conv1", "fc1"], theirs.state.values())}
    for name in ["conv1", "fc1"]:
        np.testing.assert_allclose(np.asarray(ours.state[name]), ref[name],
                                   rtol=1e-5, atol=1e-7)


def test_kfac_parity(setup):
    ours = _ours(setup, estimators.KFAC)
    theirs = _theirs(setup, "KFAC")
    ref = {n: (v[0].detach().numpy(), v[1].detach().numpy())
           for n, v in zip(["conv1", "fc1"], theirs.state.values())}
    for name in ["conv1", "fc1"]:
        np.testing.assert_allclose(np.asarray(ours.state[name]["a"]),
                                   ref[name][0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.state[name]["g"]),
                                   ref[name][1], rtol=1e-5, atol=1e-7)


def test_kfac_invert_parity(setup):
    ours = _ours(setup, estimators.KFAC)
    theirs = _theirs(setup, "KFAC")
    ours.invert(add=0.5, multiply=2.0)
    theirs.invert(add=0.5, multiply=2.0)
    ref = {n: (v[0].detach().numpy(), v[1].detach().numpy())
           for n, v in zip(["conv1", "fc1"], theirs.inv_state.values())}
    for name in ["conv1", "fc1"]:
        np.testing.assert_allclose(np.asarray(ours.inv_state[name]["a_chol"]),
                                   ref[name][0], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.inv_state[name]["g_chol"]),
                                   ref[name][1], rtol=1e-4, atol=1e-6)


def test_efb_parity(setup):
    kfac_ours = _ours(setup, estimators.KFAC)
    kfac_theirs = _theirs(setup, "KFAC")
    _, jmodel, variables, _, _, jx, jlabels = setup

    ours = estimators.EFB(jmodel, variables, kfac_ours.state)
    ours.update(jx, labels=jlabels)

    theirs = _theirs(setup, "EFB", factors=kfac_theirs.state)
    ref_lam = {n: v.detach().numpy()
               for n, v in zip(["conv1", "fc1"], theirs.state.values())}
    ref_diags = {n: v.detach().numpy()
                 for n, v in zip(["conv1", "fc1"], theirs.diags.values())}
    for name in ["conv1", "fc1"]:
        np.testing.assert_allclose(np.asarray(ours.state[name]),
                                   ref_lam[name], rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ours.diags[name]),
                                   ref_diags[name], rtol=1e-5, atol=1e-7)


# The reference's own INF cannot run unmodified on torch>=2 (its
# _dim_reduction indexes tensors with lists of 0-dim tensors, an IndexError
# since torch 2.x, curvatures.py:643-645). H.ReferenceINF shims exactly that
# (int conversions, same 1-based bookkeeping), making the reference INF
# chain (curvatures.py:487-600) executable ground truth.

def _inf_pair(setup, rank):
    """Build both INF estimators from their own frameworks' (parity-tested)
    Diagonal/KFAC/EFB chains and run update(rank)."""
    tmodel, jmodel, variables, _, _, jx, jlabels = setup

    diag_t = _theirs(setup, "Diagonal")
    kfac_t = _theirs(setup, "KFAC")
    efb_t = _theirs(setup, "EFB", factors=kfac_t.state)
    inf_t = H.make_reference_inf(tmodel, diag_t.state, kfac_t.state,
                                 efb_t.state)
    inf_t.update(rank=rank)

    diag_o = _ours(setup, estimators.Diagonal)
    kfac_o = _ours(setup, estimators.KFAC)
    efb_o = estimators.EFB(jmodel, variables, kfac_o.state)
    efb_o.update(jx, labels=jlabels)
    inf_o = estimators.INF(jmodel, variables, diag_o.state, kfac_o.state,
                           efb_o.state)
    # bucket=1: the golden comparison pins the reference's exact
    # data-dependent index-set shapes (bucket>1 zero-pads them; posterior
    # equivalence under padding is test_inf_bucketed_update_exact)
    inf_o.update(rank=rank, bucket=1)
    return inf_t, inf_o


@pytest.mark.parametrize("rank", [12, 1000])
def test_inf_update_golden(setup, rank):
    """Layer-by-layer golden parity of INF.update: low-rank eigenvector
    index sets, gathered lambdas, and the diagonal correction
    (curvatures.py:487-507, 602-672). Eigenvectors are compared in
    magnitude (sign is eigh-implementation-defined; every INF consumer is
    sign-invariant: lambdas/corrections are squares)."""
    inf_t, inf_o = _inf_pair(setup, rank)
    ref = {n: v for n, v in zip(["conv1", "fc1"], inf_t.state.values())}
    for name in ["conv1", "fc1"]:
        lr_ua, lr_ug, lr_lam, corr = [t.detach().numpy() for t in ref[name]]
        ours = inf_o.state[name]
        assert np.asarray(ours["ua"]).shape == lr_ua.shape
        assert np.asarray(ours["ug"]).shape == lr_ug.shape
        # Eigenvectors are only determined per-column where the factor is
        # non-degenerate. Columns spanning a factor's null space (rank of
        # a a^T <= batch tokens + 1 << cols on fc layers) carry ~zero EFB
        # lambda mass and arbitrary eigh-implementation-defined bases, so
        # compare magnitudes only on lambda-carrying columns.
        lam_mat = np.asarray(ours["lam"]).reshape(lr_ua.shape[1],
                                                  lr_ug.shape[1])
        a_mask = lam_mat.sum(axis=1) > 1e-5 * lam_mat.sum()
        g_mask = lam_mat.sum(axis=0) > 1e-5 * lam_mat.sum()
        np.testing.assert_allclose(np.abs(np.asarray(ours["ua"]))[:, a_mask],
                                   np.abs(lr_ua)[:, a_mask],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.abs(np.asarray(ours["ug"]))[:, g_mask],
                                   np.abs(lr_ug)[:, g_mask],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours["lam"]), lr_lam,
                                   rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ours["corr"]), corr,
                                   rtol=2e-3, atol=1e-5)


def test_inf_sampler_covariance_vs_reference():
    """Characterizes the deliberate sampler divergences (estimators/inf.py
    docstring): with identical inputs, our sampler's covariance matches the
    exact damped inverse; the reference sampler's does not for n != m
    (vec-layout mixup, curvatures.py:589-595) nor does its two-Cholesky
    pre-sampler solve the Woodbury equation exactly (curvatures.py:554-570).

    Both samplers are linear in their internal N(0,I) draw, so the full
    transport matrix M is recovered by feeding basis vectors; cov = M M^T
    is compared without Monte-Carlo noise.
    """
    from curvature_tpu.estimators.inf import pre_sampler, sif_diagonal

    rng = np.random.default_rng(7)
    n, m = 4, 3
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = a @ a.T / n + 0.5 * np.eye(n, dtype=np.float32)
    g = rng.standard_normal((m, m)).astype(np.float32)
    g = g @ g.T / m + 0.5 * np.eye(m, dtype=np.float32)
    _, ua = np.linalg.eigh(a + a.T)
    _, ug = np.linalg.eigh(g + g.T)
    ua = ua.astype(np.float32)
    ug = ug.astype(np.float32)
    lam = (rng.standard_normal((n * m,)) ** 2).astype(np.float32)
    diag = (rng.standard_normal((n * m,)) ** 2 + 1.0).astype(np.float32)
    s, nn_ = 1.3, 0.7
    corr = np.clip(diag - np.asarray(sif_diagonal(
        jnp.asarray(ua), jnp.asarray(ug), jnp.asarray(lam))), 0.0, None)
    p = n * m

    v = np.kron(ua, ug)
    precision = np.diag(s * corr + nn_) + v @ np.diag(s * lam) @ v.T
    exact = np.linalg.inv(precision)

    # --- reference sampler transport matrix (basis vectors via randn patch)
    t_ua, t_ug = torch.from_numpy(ua), torch.from_numpy(ug)
    reg_lam_t = torch.sqrt(s * torch.from_numpy(lam))
    inv_corr_t = torch.rsqrt(s * torch.from_numpy(corr) + nn_)
    pre_t = H.ref_curvatures.INF.pre_sampler(t_ua, t_ug, reg_lam_t,
                                             inv_corr_t)
    m_ref = np.zeros((p, p), np.float32)
    orig_randn = torch.randn
    try:
        for k in range(p):
            e = torch.zeros(p)
            e[k] = 1.0
            torch.randn = lambda *a_, e=e, **kw: e
            m_ref[:, k] = H.ref_curvatures.INF.sampler(
                t_ua, t_ug, inv_corr_t, pre_t).numpy()
    finally:
        torch.randn = orig_randn
    cov_ref = m_ref @ m_ref.T

    # --- our sampler transport matrix
    from curvature_tpu.estimators.inf import inf_sample  # noqa: F401
    reg_lam = jnp.sqrt(s * jnp.asarray(lam))
    inv_corr = jnp.sqrt(1.0 / (s * jnp.asarray(corr) + nn_))
    pre = pre_sampler(jnp.asarray(ua), jnp.asarray(ug), reg_lam, inv_corr)

    def apply_ours(x):
        y_l = inv_corr * x
        xq = jnp.asarray(ua).T @ y_l.reshape(n, m) @ jnp.asarray(ug)
        qx = pre @ xq.reshape(-1)
        xps = jnp.asarray(ua) @ qx.reshape(n, m) @ jnp.asarray(ug).T
        return y_l - inv_corr ** 2 * xps.reshape(-1)

    m_ours = np.asarray(jax.vmap(apply_ours)(jnp.eye(p))).T
    cov_ours = m_ours @ m_ours.T

    err_ours = np.abs(cov_ours - exact).max() / np.abs(exact).max()
    err_ref = np.abs(cov_ref - exact).max() / np.abs(exact).max()
    # ours is exact to fp precision; the reference's layout + Cholesky
    # construction is a bona fide approximation (the numbers document it)
    assert err_ours < 5e-3, err_ours
    assert err_ref > 10 * max(err_ours, 1e-6), (err_ref, err_ours)
