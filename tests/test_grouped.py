"""Grouped / depthwise convolution support across the estimator surface.

The reference cannot run its KFAC-family estimators on grouped convolutions
at all: its unfold-built A factor has C*kh*kw columns while a grouped weight
matrix only has (C/g)*kh*kw, so sampling shape-mismatches in `_replace`
(reference curvatures.py:328-335, 67-82). Only its gradient-moment
estimators (Diagonal / BlockDiagonal) work on grouped convs. Here:

  * Diagonal / BlockDiagonal: work unchanged (golden parity vs the real
    reference below);
  * KFAC / EFB: per-group block-diagonal factors ([g, F+1, F+1] A,
    [g, O/g, O/g] G) — each group is an independent convolution, so
    cross-group weight-space covariance is exactly zero;
  * INF: the low-rank + diagonal-correction chain batches over the group
    axis (each group is an independent Kronecker basis), re-using the
    ScanBlocks batched path; covariance validated per group below.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, nn
from curvature_tpu.nn.core import matrix_to_delta, param_matrix


# ------------------------------------------------------------- fixtures
class _GroupedNet(nn.Module):
    """conv -> grouped conv -> depthwise conv -> fc."""

    def __init__(self):
        self.c1 = nn.Conv(8, 3, padding=1, name="c1")
        self.c2 = nn.Conv(8, 3, padding=1, groups=4, name="c2")
        self.dw = nn.Conv(8, 3, strides=2, padding=1, groups=8, name="dw")
        self.fc = nn.Dense(5, name="fc")

    def __call__(self, ctx, x):
        x = nn.ReLU()(ctx, self.c1(ctx, x))
        x = nn.ReLU()(ctx, self.c2(ctx, x))
        x = nn.ReLU()(ctx, self.dw(ctx, x))
        x = nn.Flatten()(ctx, x)
        return self.fc(ctx, x)


@pytest.fixture(scope="module")
def grouped_net():
    model = nn.Model(_GroupedNet())
    x = jax.random.normal(jax.random.key(0), (4, 6, 6, 3))
    variables = model.init(jax.random.key(1), x)
    labels = jnp.asarray(
        np.random.default_rng(2).integers(0, 5, size=(2, 4)))
    return model, variables, x, labels


def _fit(cls, fixture, **kw):
    model, variables, x, labels = fixture
    est = cls(model, variables, **kw)
    est.update(x, labels=labels)
    return est


# ------------------------------------------------- layer-level parity
def test_grouped_conv_forward_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 8).astype(np.float32)
    for groups, cin, cout, stride, use_bias in [
            (4, 8, 8, 1, True), (2, 8, 4, 2, True), (8, 8, 8, 1, False)]:
        k = rng.randn(3, 3, cin // groups, cout).astype(np.float32)
        b = rng.randn(cout).astype(np.float32) if use_bias else None
        ty = F.conv2d(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                      torch.tensor(np.transpose(k, (3, 2, 0, 1))),
                      torch.tensor(b) if use_bias else None,
                      stride=stride, padding=1, groups=groups).numpy()
        params = {"kernel": jnp.asarray(k)}
        if use_bias:
            params["bias"] = jnp.asarray(b)
        ctx = nn.core.Context({"c": params})
        y = nn.Conv(cout, 3, strides=stride, padding=1, groups=groups,
                    use_bias=use_bias, name="c")(ctx, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y),
                                   np.transpose(ty, (0, 2, 3, 1)),
                                   rtol=1e-4, atol=1e-5)


def test_grouped_param_matrix_roundtrip(grouped_net):
    model, variables, _, _ = grouped_net
    for name in ("c2", "dw"):
        meta = model.metas[name]
        assert meta.groups > 1
        mat = param_matrix(meta, variables["params"][name])
        assert mat.shape == (meta.out_features, meta.mat_cols)
        back = matrix_to_delta(meta, mat)
        for key, val in back.items():
            np.testing.assert_array_equal(
                np.asarray(val), np.asarray(variables["params"][name][key]))


# ----------------------------------- KFAC: block-equivalence + sampling
class _TwoParallel(nn.Module):
    """Two independent convs on channel slices == one grouped conv."""

    def __init__(self):
        self.ca = nn.Conv(2, 3, padding=1, name="ca")
        self.cb = nn.Conv(2, 3, padding=1, name="cb")
        self.fc = nn.Dense(5, name="fc")

    def __call__(self, ctx, x):
        y = jnp.concatenate([self.ca(ctx, x[..., :2]),
                             self.cb(ctx, x[..., 2:])], axis=-1)
        y = nn.ReLU()(ctx, y)
        y = nn.Flatten()(ctx, y)
        return self.fc(ctx, y)


class _OneGrouped(nn.Module):
    def __init__(self):
        self.c = nn.Conv(4, 3, padding=1, groups=2, name="c")
        self.fc = nn.Dense(5, name="fc")

    def __call__(self, ctx, x):
        y = nn.ReLU()(ctx, self.c(ctx, x))
        y = nn.Flatten()(ctx, y)
        return self.fc(ctx, y)


def test_kfac_grouped_equals_parallel_convs():
    """A grouped conv IS g parallel convs: with identical weights/inputs/
    labels, the grouped KFAC factors must equal the per-conv factors of the
    explicitly-split model, group by group."""
    x = jax.random.normal(jax.random.key(3), (4, 5, 5, 4))
    labels = jnp.asarray(
        np.random.default_rng(4).integers(0, 5, size=(2, 4)))

    split = nn.Model(_TwoParallel())
    vs = split.init(jax.random.key(5), x)
    ka = vs["params"]["ca"]["kernel"]     # [3, 3, 2, 2]
    kb = vs["params"]["cb"]["kernel"]

    grouped = nn.Model(_OneGrouped())
    vg = grouped.init(jax.random.key(6), x)
    vg["params"]["c"]["kernel"] = jnp.concatenate([ka, kb], axis=-1)
    vg["params"]["c"]["bias"] = jnp.concatenate(
        [vs["params"]["ca"]["bias"], vs["params"]["cb"]["bias"]])
    vg["params"]["fc"] = vs["params"]["fc"]

    outs, _ = split.apply(vs, x)
    outg, _ = grouped.apply(vg, x)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outg),
                               rtol=1e-5, atol=1e-6)

    es = estimators.KFAC(split, vs)
    es.update(x, labels=labels)
    eg = estimators.KFAC(grouped, vg)
    eg.update(x, labels=labels)

    for j, name in enumerate(("ca", "cb")):
        np.testing.assert_allclose(np.asarray(eg.state["c"]["a"][j]),
                                   np.asarray(es.state[name]["a"]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(eg.state["c"]["g"][j]),
                                   np.asarray(es.state[name]["g"]),
                                   rtol=1e-4, atol=1e-6)


def test_kfac_grouped_sample_covariance(grouped_net):
    """Per-group sampled blocks have covariance A_j^-1 (x) G_j^-1."""
    est = _fit(estimators.KFAC, grouped_net)
    s, n = 2.0, 0.3
    est.invert(add=n, multiply=s)
    name = "c2"
    for j in range(4):
        a = np.asarray(est.state[name]["a"][j])
        g = np.asarray(est.state[name]["g"][j])
        a_d = np.sqrt(s) * a + np.sqrt(n) * np.eye(a.shape[0])
        g_d = np.sqrt(s) * g + np.sqrt(n) * np.eye(g.shape[0])
        expected = np.kron(np.linalg.inv((a_d + a_d.T) / 2),
                           np.linalg.inv((g_d + g_d.T) / 2))
        a_chol = np.asarray(est.inv_state[name]["a_chol"][j])
        g_chol = np.asarray(est.inv_state[name]["g_chol"][j])
        cov = np.kron(a_chol @ a_chol.T, g_chol @ g_chol.T)
        np.testing.assert_allclose(cov, expected, rtol=1e-4, atol=1e-6)


def test_kfac_grouped_posterior_forward(grouped_net):
    model, variables, x, _ = grouped_net
    est = _fit(estimators.KFAC, grouped_net)
    est.invert(0.5, 1.0)
    sample = est.sample(jax.random.key(7))
    for name, meta in est.metas.items():
        assert sample[name].shape == (meta.out_features, meta.mat_cols)
    params = est.posterior_params(jax.random.key(8))
    out, _ = model.apply({"params": params,
                          "batch_stats": variables["batch_stats"]}, x)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_kfac_grouped_subsample_unbiased():
    """The k^2 offset grids still partition the token set for grouped
    layers: count-weighted offset-averaged factors == full factors."""
    model = nn.Model(_OneGrouped())
    x = jax.random.normal(jax.random.key(9), (2, 6, 6, 4))
    variables = model.init(jax.random.key(10), x)
    labels = jnp.asarray([[0, 1]])

    full = estimators.KFAC(model, variables, use_pallas=False)
    full.update(x, labels=labels)

    k = 2
    acc = None
    weights = 0.0
    for o0 in range(k):
        for o1 in range(k):
            est = estimators.KFAC(model, variables, use_pallas=False,
                                  token_subsample=1.0 / k ** 2,
                                  subsample_offset=(o0, o1))
            est.update(x, labels=labels)
            h = (6 - o0 + k - 1) // k
            w = (6 - o1 + k - 1) // k
            cnt = 2 * h * w
            a = np.asarray(est.state["c"]["a"]) * cnt
            acc = a if acc is None else acc + a
            weights += cnt
    np.testing.assert_allclose(acc / weights, np.asarray(full.state["c"]["a"]),
                               rtol=1e-4, atol=1e-6)


# --------------------------------------------------------- EFB grouped
def test_efb_grouped_sample_covariance(grouped_net):
    """Per-group EFB sampler covariance equals the damped inverse rotated
    out of that group's Kronecker eigenbasis (mirror of
    test_efb_sample_covariance_exact for block factors)."""
    model, variables, x, labels = grouped_net
    kfac = _fit(estimators.KFAC, grouped_net)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    s_mult, n_add = 2.0, 0.5
    efb.invert(add=n_add, multiply=s_mult)
    name = "c2"
    for j in range(4):
        ua = np.asarray(efb.eigvecs[name]["a"][j])        # [cols, cols]
        ug = np.asarray(efb.eigvecs[name]["g"][j])        # [og, og]
        ilam_t = np.asarray(efb.inv_state["ilam"][name][j]).T  # [cols, og]
        cols, og = ilam_t.shape
        m_cols = []
        for i in range(cols):
            for jj in range(og):
                z = np.zeros((cols, og), np.float32)
                z[i, jj] = 1.0
                samp = ua @ (z * ilam_t) @ ug.T
                m_cols.append(samp.reshape(-1))
        m = np.stack(m_cols, axis=1)
        cov = m @ m.T
        lam_vec = np.asarray(efb.state[name][j]).T.reshape(-1)
        kron_u = np.kron(ua, ug)
        expected = kron_u @ np.diag(1.0 / (s_mult * lam_vec + n_add)) \
            @ kron_u.T
        np.testing.assert_allclose(cov, expected, rtol=1e-3, atol=1e-5)


def test_efb_grouped_free_diagonal(grouped_net):
    """EFB's free Diagonal is unaffected by the grouped factor structure."""
    model, variables, x, labels = grouped_net
    kfac = _fit(estimators.KFAC, grouped_net)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    diag = _fit(estimators.Diagonal, grouped_net)
    for name in efb.metas:
        np.testing.assert_allclose(np.asarray(efb.diags[name]),
                                   np.asarray(diag.state[name]),
                                   rtol=1e-4, atol=1e-6)


def test_efb_grouped_posterior_forward(grouped_net):
    model, variables, x, labels = grouped_net
    kfac = _fit(estimators.KFAC, grouped_net)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    efb.invert(0.5, 1.0)
    params = efb.posterior_params(jax.random.key(11))
    out, _ = model.apply({"params": params,
                          "batch_stats": variables["batch_stats"]}, x)
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------- INF grouped
@pytest.fixture(scope="module")
def grouped_inf(grouped_net):
    model, variables, x, labels = grouped_net
    kfac = _fit(estimators.KFAC, grouped_net)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    diag = _fit(estimators.Diagonal, grouped_net)
    return estimators.INF(model, variables, diag.state, kfac.state,
                          efb.state), diag


def test_inf_grouped_full_rank_correction(grouped_inf):
    """Full-rank INF on a grouped layer: each group's diagonal correction
    equals that group's diag block minus the dense per-group sif diagonal
    (the low-rank chain batches over groups exactly like ScanBlocks depth)."""
    inf, diag = grouped_inf
    inf.update(rank=10_000)
    name = "c2"
    meta = inf.metas[name]
    g, og = meta.groups, meta.out_features // meta.groups
    st = inf.state[name]
    diag_blocks = np.asarray(diag.state[name]).reshape(g, og, meta.mat_cols)
    for j in range(g):
        v = np.kron(np.asarray(st["ua"][j]), np.asarray(st["ug"][j]))
        dense_corr = diag_blocks[j].T.reshape(-1) \
            - np.diag(v @ np.diag(np.asarray(st["lam"][j])) @ v.T)
        np.testing.assert_allclose(np.asarray(st["corr"][j]), dense_corr,
                                   rtol=1e-3, atol=1e-4)


def test_inf_grouped_sampler_covariance(grouped_inf):
    """Per-group INF sampler covariance equals the dense damped inverse of
    that group's (diag-correction + low-rank) precision block; the layer
    sample re-stacks group-major into the [out, cols] matrix view."""
    from curvature_tpu.estimators.inf import inf_sample

    inf, _ = grouped_inf
    inf.update(rank=6)
    s_mult, n_add = 1.7, 0.4
    inf.invert(add=n_add, multiply=s_mult)
    name = "dw"                                    # depthwise, groups=8
    meta = inf.metas[name]
    st, inv = inf.state[name], inf.inv_state[name]

    sample = inf.sample(jax.random.key(12))
    assert sample[name].shape == (meta.out_features, meta.mat_cols)
    assert bool(jnp.isfinite(sample[name]).all())

    for j in range(2):                             # two groups suffice
        ua, ug = np.asarray(st["ua"][j]), np.asarray(st["ug"][j])
        lam = np.asarray(st["lam"][j])
        corr = np.clip(np.asarray(st["corr"][j]), 0.0, None)
        n, m = ua.shape[0], ug.shape[0]
        p = n * m

        ic = jnp.asarray(inv["inv_corr"][j])
        pre = jnp.asarray(inv["pre"][j])

        def apply_sampler(x_vec):
            y_l = ic * x_vec
            xq = jnp.asarray(ua).T @ y_l.reshape(n, m) @ jnp.asarray(ug)
            qx = pre @ xq.reshape(-1)
            xps = jnp.asarray(ua) @ qx.reshape(ua.shape[1], ug.shape[1]) \
                @ jnp.asarray(ug).T
            y_r = ic ** 2 * xps.reshape(-1)
            return y_l - y_r

        m_mat = np.asarray(jax.vmap(apply_sampler)(jnp.eye(p))).T
        cov = m_mat @ m_mat.T
        v = np.kron(ua, ug)
        precision = np.diag(s_mult * corr + n_add) \
            + v @ np.diag(s_mult * lam) @ v.T
        np.testing.assert_allclose(cov, np.linalg.inv(precision),
                                   rtol=5e-3, atol=1e-5)


def test_inf_grouped_posterior_forward(grouped_inf):
    model = grouped_inf[0].model
    inf, _ = grouped_inf
    inf.update(rank=8)
    inf.invert(0.5, 1.0)
    params = inf.posterior_params(jax.random.key(13))
    x = jax.random.normal(jax.random.key(0), (4, 6, 6, 3))
    out, _ = model.apply({"params": params,
                          "batch_stats": inf.variables["batch_stats"]}, x)
    assert bool(jnp.all(jnp.isfinite(out)))


# ------------------------------------- golden parity vs the reference
def test_diagonal_blockdiag_grouped_golden_parity():
    """The reference's gradient-moment estimators DO support grouped convs
    (they only touch param grads); byte-identical inputs must give factor
    parity at 1e-5 — the same bar as tests/test_parity_reference.py."""
    from tests import reference_harness as H

    torch.manual_seed(0)
    tmodel = torch.nn.Sequential(
        torch.nn.Conv2d(4, 4, 3, padding=1, groups=2),
        torch.nn.ReLU(),
        H.TorchFlatten(),
        torch.nn.Linear(4 * 5 * 5, 5),
    )

    class JNet(nn.Module):
        def __init__(self):
            self.c = nn.Conv(4, 3, padding=1, groups=2, name="c")
            self.fc = nn.Dense(5, name="fc")

        def __call__(self, ctx, x):
            y = nn.ReLU()(ctx, self.c(ctx, x))
            y = nn.Flatten()(ctx, y)
            return self.fc(ctx, y)

    from curvature_tpu.models.torch_convert import convert_torch_state_dict
    jmodel = nn.Model(JNet())
    variables = convert_torch_state_dict(
        tmodel.state_dict(), {"0": "c", "3": "fc"})
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    _ = jmodel.init(jax.random.key(0), jnp.zeros((4, 5, 5, 4)))

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 4, 5, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 4))
    jx = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    for ours_cls, ref_name in [(estimators.Diagonal, "Diagonal"),
                               (estimators.BlockDiagonal, "BlockDiagonal")]:
        ours = ours_cls(jmodel, variables)
        ours.update(jx, labels=jnp.asarray(labels))
        theirs = H.run_reference_estimator(
            ref_name, tmodel, torch.from_numpy(x),
            torch.from_numpy(labels), 4)
        ref = {n: v.detach().numpy()
               for n, v in zip(["c", "fc"], theirs.state.values())}
        for name in ["c", "fc"]:
            np.testing.assert_allclose(np.asarray(ours.state[name]),
                                       ref[name], rtol=1e-5, atol=1e-6)


def test_grouped_logdet_and_quadratic_form(grouped_net):
    """Grouped-conv logdet/quad: sum over per-group Kronecker blocks
    matches dense per-group constructions (KFAC and EFB paths)."""
    import math
    model, variables, x, labels = grouped_net
    add, mult = 0.4, 1.5
    kfac = _fit(estimators.KFAC, grouped_net)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)

    deltas = {}
    rng = np.random.default_rng(7)
    for name, m in kfac.metas.items():
        deltas[name] = jnp.asarray(rng.standard_normal(
            (m.out_features, m.mat_cols)).astype(np.float32))

    want_ld, want_q = 0.0, 0.0
    for name, m in kfac.metas.items():
        a = np.asarray(kfac.state[name]["a"], np.float64)
        g = np.asarray(kfac.state[name]["g"], np.float64)
        d = np.asarray(deltas[name], np.float64)
        if a.ndim == 2:
            a, g = a[None], g[None]
            blocks = d[None]
        else:
            og = m.out_features // m.groups
            blocks = d.reshape(m.groups, og, -1)
        for k in range(a.shape[0]):
            ad = math.sqrt(mult) * (a[k] + a[k].T) / 2 \
                + math.sqrt(add) * np.eye(a[k].shape[0])
            gd = math.sqrt(mult) * (g[k] + g[k].T) / 2 \
                + math.sqrt(add) * np.eye(g[k].shape[0])
            want_ld += np.linalg.slogdet(np.kron(ad, gd))[1]
            want_q += float(np.sum(blocks[k] * (gd @ blocks[k] @ ad)))
    np.testing.assert_allclose(kfac.logdet_precision(add, mult), want_ld,
                               rtol=1e-4)
    np.testing.assert_allclose(kfac.quadratic_form(deltas, add, mult),
                               want_q, rtol=1e-4)

    # EFB: per-group eigenbasis weights
    want_q = 0.0
    for name, m in efb.metas.items():
        ua = np.asarray(efb.eigvecs[name]["a"], np.float64)
        ug = np.asarray(efb.eigvecs[name]["g"], np.float64)
        w = mult * np.asarray(efb.state[name], np.float64) + add
        d = np.asarray(deltas[name], np.float64)
        if ua.ndim == 2:
            rot = ug.T @ d @ ua
            want_q += float(np.sum(w * rot * rot))
        else:
            og = m.out_features // m.groups
            blocks = d.reshape(m.groups, og, -1)
            for k in range(ua.shape[0]):
                rot = ug[k].T @ blocks[k] @ ua[k]
                want_q += float(np.sum(w[k] * rot * rot))
    np.testing.assert_allclose(efb.quadratic_form(deltas, add, mult),
                               want_q, rtol=1e-4)
