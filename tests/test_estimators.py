"""Estimator property tests against dense math.

BlockDiagonal is the built-in exact per-layer Fisher; KFAC/EFB sampling
covariances are validated algebraically (apply the linear sampler to basis
vectors — no Monte-Carlo noise), and INF is validated against a dense
Kronecker construction since the reference INF cannot execute on torch>=2
(see tests/test_parity_reference.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.estimators.inf import (dim_reduction, inf_sample,
                                          pre_sampler, sif_diagonal)
from curvature_tpu.ops.linalg import eigh_sym


@pytest.fixture(scope="module")
def small_mlp():
    model = models.mlp([7], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 5))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 4)
    return model, variables, x, labels


def _fit(cls, small_mlp, **kw):
    model, variables, x, labels = small_mlp
    est = cls(model, variables, **kw)
    est.update(x, labels=labels)
    return est


def test_kfac_sample_covariance(small_mlp):
    """Sampled offsets have covariance A_damped^-1 (x) G_damped^-1."""
    est = _fit(estimators.KFAC, small_mlp)
    est.invert(add=0.3, multiply=2.0)
    name = "fc1"
    a = np.asarray(est.state[name]["a"])
    g = np.asarray(est.state[name]["g"])
    s, n = 2.0, 0.3
    a_d = np.sqrt(s) * a + np.sqrt(n) * np.eye(a.shape[0])
    g_d = np.sqrt(s) * g + np.sqrt(n) * np.eye(g.shape[0])
    expected = np.kron(np.linalg.inv((a_d + a_d.T) / 2),
                       np.linalg.inv((g_d + g_d.T) / 2))

    a_chol = np.asarray(est.inv_state[name]["a_chol"])
    g_chol = np.asarray(est.inv_state[name]["g_chol"])
    # sample = (a_chol Z g_chol^T)^T  =>  vec (cols-major i*m+j) covariance
    cov = np.kron(a_chol @ a_chol.T, g_chol @ g_chol.T)
    np.testing.assert_allclose(cov, expected, rtol=1e-4, atol=1e-6)


def test_block_diagonal_sample_covariance(small_mlp):
    """BlockDiagonal sampling: cov(L z) == inv(multiply*F + add*I)."""
    est = _fit(estimators.BlockDiagonal, small_mlp)
    est.invert(add=0.5, multiply=1.5)
    name = "fc1"
    f = np.asarray(est.state[name])
    expected = np.linalg.inv(1.5 * f + 0.5 * np.eye(f.shape[0]))
    l = np.asarray(est.inv_state[name])
    np.testing.assert_allclose(l @ l.T, expected, rtol=1e-3, atol=1e-5)


def test_efb_reconstruction(small_mlp):
    """EFB lambdas are exact second moments in the Kronecker eigenbasis:
    rotating the accumulated per-sample gradient matrices reproduces them."""
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)

    from curvature_tpu.estimators.capture import collect
    cap = collect(model, efb.metas, variables, x, labels=labels, train=True)
    name = "fc1"
    ua = np.asarray(efb.eigvecs[name]["a"])
    ug = np.asarray(efb.eigvecs[name]["g"])
    grads = np.asarray(cap.param_grads[name])          # [S, out, cols]
    expected = sum((ug.T @ g @ ua) ** 2 for g in grads)
    np.testing.assert_allclose(np.asarray(efb.state[name]), expected,
                               rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# INF dense validation
# ---------------------------------------------------------------------------

def _dense_inf_inputs(rng, n=4, m=3):
    """Random SPD Kronecker factors + diag/lambda data for one fake layer."""
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = a @ a.T / n + 0.5 * np.eye(n, dtype=np.float32)
    g = rng.standard_normal((m, m)).astype(np.float32)
    g = g @ g.T / m + 0.5 * np.eye(m, dtype=np.float32)
    _, ua = np.linalg.eigh(a + a.T)
    _, ug = np.linalg.eigh(g + g.T)
    lam = (rng.standard_normal((n * m,)) ** 2).astype(np.float32)
    diag = (rng.standard_normal((n * m,)) ** 2 + 1.0).astype(np.float32)
    return ua.astype(np.float32), ug.astype(np.float32), lam, diag


def test_inf_dim_reduction_properties(rng):
    n, m, rank = 6, 5, 7
    lam = rng.standard_normal((n * m,)).astype(np.float32)
    left, right, grid = dim_reduction(lam, n, m, rank)
    # every top-`rank` |lambda| index is covered by the completed grid
    top = np.argsort(-np.abs(lam), kind="stable")[:rank]
    assert set(top).issubset(set(grid.tolist()))
    # the grid is exactly the index-set product
    assert set(grid.tolist()) == {i * m + j for i in left for j in right}
    assert len(grid) == len(left) * len(right)


def test_inf_sif_diagonal_dense(rng):
    ua, ug, lam, _ = _dense_inf_inputs(rng)
    v = np.kron(ua, ug)
    dense = np.diag(v @ np.diag(lam) @ v.T)
    ours = np.asarray(sif_diagonal(jnp.asarray(ua), jnp.asarray(ug),
                                   jnp.asarray(lam)))
    np.testing.assert_allclose(ours, dense, rtol=1e-4, atol=1e-6)


def test_inf_sampler_covariance_exact(rng):
    """Apply the INF sampler to identity basis vectors: M M^T must equal
    inv(diag(s*corr + n) + V (s*Lam) V^T) to fp precision."""
    ua, ug, lam, diag = _dense_inf_inputs(rng)
    n, m = ua.shape[0], ug.shape[0]
    p = n * m
    s, nn = 1.3, 0.7
    corr = (diag - np.asarray(
        sif_diagonal(jnp.asarray(ua), jnp.asarray(ug), jnp.asarray(lam))))
    corr = np.clip(corr, 0.0, None).astype(np.float32)

    reg_lambda = jnp.sqrt(s * jnp.asarray(lam))
    inv_corr = jnp.sqrt(1.0 / (s * jnp.asarray(corr) + nn))
    pre = pre_sampler(jnp.asarray(ua), jnp.asarray(ug), reg_lambda, inv_corr)
    assert bool(jnp.isfinite(pre).all())

    # The sampler is linear in X: recover its matrix M by applying the
    # deterministic part to basis vectors (replace random X with basis e_k).
    def apply_sampler(x_vec):
        y_l = inv_corr * x_vec
        xq = jnp.asarray(ua).T @ y_l.reshape(n, m) @ jnp.asarray(ug)
        qx = pre @ xq.reshape(-1)
        xps = jnp.asarray(ua) @ qx.reshape(ua.shape[1], ug.shape[1]) @ jnp.asarray(ug).T
        y_r = inv_corr ** 2 * xps.reshape(-1)
        return y_l - y_r

    m_mat = np.asarray(jax.vmap(apply_sampler)(jnp.eye(p))).T   # [p, p]
    cov = m_mat @ m_mat.T

    v = np.kron(ua, ug)
    precision = np.diag(s * corr + nn) + v @ np.diag(s * lam) @ v.T
    expected = np.linalg.inv(precision)
    np.testing.assert_allclose(cov, expected, rtol=5e-3, atol=1e-5)


def test_inf_end_to_end(small_mlp):
    """Full INF pipeline on the MLP: finite state, finite samples, and the
    full-rank correction reproduces diag - dense sif diagonal."""
    model, variables, x, labels = small_mlp
    diag = _fit(estimators.Diagonal, small_mlp)
    kfac = _fit(estimators.KFAC, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)

    inf = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    inf.update(rank=1000)  # full rank on this tiny model
    name = "fc1"
    st = inf.state[name]
    ua, ug = np.asarray(st["ua"]), np.asarray(st["ug"])
    lam = np.asarray(st["lam"])
    diag_vec = np.asarray(diag.state[name]).T.reshape(-1)
    v = np.kron(ua, ug)
    dense_corr = diag_vec - np.diag(v @ np.diag(lam) @ v.T)
    np.testing.assert_allclose(np.asarray(st["corr"]), dense_corr,
                               rtol=1e-3, atol=1e-4)

    inf.invert(add=1.0, multiply=10.0)
    sample = inf.sample(jax.random.PRNGKey(3))
    for v_ in sample.values():
        assert bool(jnp.isfinite(v_).all())


def test_diagonal_sample_variance(small_mlp):
    """Diagonal sampling variance equals 1/(multiply*F + add) elementwise."""
    est = _fit(estimators.Diagonal, small_mlp)
    est.invert(add=0.7, multiply=3.0)
    name = "fc1"
    expected_var = 1.0 / (3.0 * np.asarray(est.state[name]) + 0.7)
    np.testing.assert_allclose(np.asarray(est.inv_state[name]) ** 2,
                               expected_var, rtol=1e-5)
    # many-sample empirical check on a few entries
    samples = np.stack([
        np.asarray(est.sample(jax.random.PRNGKey(i))[name])
        for i in range(300)])
    emp = samples.var(axis=0)
    ratio = emp / expected_var
    assert 0.7 < np.median(ratio) < 1.3


def test_efb_sample_covariance_exact(small_mlp):
    """EFB sampler applied to basis matrices: covariance equals the damped
    inverse rotated out of the Kronecker eigenbasis."""
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    s_mult, n_add = 2.0, 0.5
    efb.invert(add=n_add, multiply=s_mult)
    name = "fc1"
    ua = np.asarray(efb.eigvecs[name]["a"])           # [cols, cols]
    ug = np.asarray(efb.eigvecs[name]["g"])           # [out, out]
    ilam_t = np.asarray(efb.inv_state["ilam"][name]).T  # [cols, out]
    cols, out = ilam_t.shape

    # the sampler is linear in z: build its matrix via basis application
    m_cols = []
    for i in range(cols):
        for j in range(out):
            z = np.zeros((cols, out), np.float32)
            z[i, j] = 1.0
            samp = (ua @ (z * ilam_t) @ ug.T)          # [cols, out]
            m_cols.append(samp.reshape(-1))            # layout i*out + j
    m = np.stack(m_cols, axis=1)
    cov = m @ m.T

    lam_vec = np.asarray(efb.state[name]).T.reshape(-1)   # i*out + j
    kron_u = np.kron(ua, ug)
    expected = kron_u @ np.diag(1.0 / (s_mult * lam_vec + n_add)) @ kron_u.T
    np.testing.assert_allclose(cov, expected, rtol=1e-3, atol=1e-5)


def test_update_batches_scan_matches_loop(small_mlp):
    """lax.scan-folded updates accumulate exactly like a Python loop."""
    model, variables, x, _ = small_mlp
    xs = jnp.stack([x, x * 0.5, x * 2.0])
    rng = jax.random.PRNGKey(7)
    rngs = jax.random.split(rng, 3)

    a = estimators.KFAC(model, variables)
    a.update_batches(xs, rng, num_samples=2)

    b = estimators.KFAC(model, variables)
    for i in range(3):
        b.update(xs[i], rng=rngs[i], num_samples=2)

    for name in a.state:
        np.testing.assert_allclose(np.asarray(a.state[name]["a"]),
                                   np.asarray(b.state[name]["a"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.state[name]["g"]),
                                   np.asarray(b.state[name]["g"]),
                                   rtol=1e-5, atol=1e-6)

    e1 = estimators.EFB(model, variables, a.state)
    e1.update_batches(xs, rng, num_samples=2)
    e2 = estimators.EFB(model, variables, a.state)
    for i in range(3):
        e2.update(xs[i], rng=rngs[i], num_samples=2)
    for name in e1.state:
        np.testing.assert_allclose(np.asarray(e1.state[name]),
                                   np.asarray(e2.state[name]),
                                   rtol=1e-5, atol=1e-6)


def test_kfac_token_subsample_unbiasedness():
    """Exact unbiasedness: the k^2 offset grids of stride k partition the
    conv positions, so the average of subsampled factors over all offsets
    equals the full factor (lenet5's conv grids, 28x28 and 10x10, are
    divisible by k=2, so per-offset token counts are equal and the plain
    mean is the count-weighted one)."""
    model = models.lenet5()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 28, 28, 1))   # arbitrary inputs: exact
    variables = model.init(rng, jnp.zeros((1, 28, 28, 1)))
    labels = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 0, 10)

    full = estimators.KFAC(model, variables)
    full.update(x, labels=labels)

    k = 2
    offset_states = []
    for o0 in range(k):
        for o1 in range(k):
            sub = estimators.KFAC(model, variables,
                                  token_subsample=1.0 / k ** 2,
                                  subsample_offset=(o0, o1))
            sub.update(x, labels=labels)
            offset_states.append(sub.state)

    for name in full.state:
        for fac in ("a", "g"):
            mean = np.mean([np.asarray(s[name][fac]) for s in offset_states],
                           axis=0)
            np.testing.assert_allclose(
                mean, np.asarray(full.state[name][fac]),
                rtol=1e-5, atol=1e-6,
                err_msg=f"{name}/{fac} offset-average != full factor")


def test_efb_scan_donation_semantics(small_mlp):
    """update_batches donates its carry (base.py _jit_update_scan,
    donate_argnums=0). On donation-honoring backends (TPU/GPU) the input
    eigvec buffers are invalidated, so EFB must retain the RETURNED carry's
    eigvecs — keeping the originals crashes on the second chunk / invert.
    CPU ignores donation, so we emulate it by explicitly deleting the
    pre-update buffers and asserting the estimator still works."""
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)

    old_leaves = jax.tree_util.tree_leaves(
        (efb.state, efb.diags, efb.eigvecs))
    xs = jnp.stack([x, x])
    efb.update_batches(xs, jax.random.PRNGKey(0), num_samples=2)
    # second chunk, as pipelines/factors.py issues per scan_chunk
    efb.update_batches(xs, jax.random.PRNGKey(1), num_samples=2)

    # emulate donation: the original buffers are gone on TPU/GPU
    for leaf in old_leaves:
        leaf.delete()

    for leaf in jax.tree_util.tree_leaves(
            (efb.state, efb.diags, efb.eigvecs)):
        assert not leaf.is_deleted(), \
            "estimator retained a donated (deleted) buffer"
    efb.invert(add=0.5, multiply=2.0)
    delta = efb.sample(jax.random.PRNGKey(2))
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in delta.values())


def test_inf_bucketed_update_exact(small_mlp):
    """bucket>1 pads index sets with zero-lambda slots: shapes change,
    the posterior must not (corr identical; sampler covariance identical)."""
    model, variables, x, labels = small_mlp
    diag = _fit(estimators.Diagonal, small_mlp)
    kfac = _fit(estimators.KFAC, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)

    a = estimators.INF(model, variables, diag.state, kfac.state, efb.state,
                       eigvecs=efb.eigvecs)
    a.update(rank=7, bucket=1)
    b = estimators.INF(model, variables, diag.state, kfac.state, efb.state,
                       eigvecs=efb.eigvecs)
    b.update(rank=7, bucket=4)

    name = "fc1"
    np.testing.assert_allclose(np.asarray(a.state[name]["corr"]),
                               np.asarray(b.state[name]["corr"]),
                               rtol=1e-5, atol=1e-6)
    assert b.state[name]["ua"].shape[1] % 4 == 0 or \
        b.state[name]["ua"].shape[1] == a.state[name]["ua"].shape[0]

    # identical posterior covariance: apply both samplers to basis vectors
    a.invert(add=0.7, multiply=1.3)
    b.invert(add=0.7, multiply=1.3)

    def transport(est):
        s = est.inv_state[name]
        n, m = s["ua"].shape[0], s["ug"].shape[0]
        p = n * m

        def apply(xv):
            y_l = s["inv_corr"] * xv
            xq = s["ua"].T @ y_l.reshape(n, m) @ s["ug"]
            qx = s["pre"] @ xq.reshape(-1)
            xps = s["ua"] @ qx.reshape(s["ua"].shape[1],
                                       s["ug"].shape[1]) @ s["ug"].T
            return y_l - s["inv_corr"] ** 2 * xps.reshape(-1)

        mm = np.asarray(jax.vmap(apply)(jnp.eye(p))).T
        return mm @ mm.T

    np.testing.assert_allclose(transport(b), transport(a),
                               rtol=1e-4, atol=1e-6)


def test_efb_batched_evaluator_has_no_embedded_constants(small_mlp):
    """The hyper batched evaluator's per-candidate body (invert -> wrap ->
    ensemble) must receive EFB's eigvecs as ARGUMENTS: closure-captured
    device arrays become jaxpr constants, i.e. 100+ MB of embedded eigvecs
    in the serialized HLO for ResNet-size models — which overflows this
    deployment's remote-compile request limit (HTTP 413, observed live on
    the hyper/efb pipeline stage)."""
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    L = len(efb.metas)

    def per_candidate(state, aux, mean_params, rng):
        add = jnp.full((L,), 0.5)
        mult = jnp.full((L,), 2.0)
        inv = efb._wrap_inv_aux(efb.invert_state(state, add, mult), aux)
        return efb._ensemble(inv, mean_params, rng, 2)

    jaxpr = jax.make_jaxpr(per_candidate)(
        efb.state, efb._inv_aux(), efb.mean_params, jax.random.PRNGKey(0))
    biggest = max((int(np.size(c)) for c in jaxpr.consts), default=0)
    assert biggest <= 64, \
        f"traced program embeds a {biggest}-element constant (closure leak)"


def test_kfac_attention_qkv_split():
    """attention_qkv_split factors the packed in_proj G per q/k/v chunk:
    the split G blocks equal the unsplit [3E, 3E] factor's diagonal blocks,
    A is unchanged, the sampler draws independent per-block matrix-normals
    with the same covariance structure, and EFB refuses split factors."""
    model = models.tiny_transformer(vocab_free_dim=8, num_heads=2,
                                    num_layers=1, num_classes=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 5, 8))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 4)

    full = estimators.KFAC(model, variables)
    full.update(x, labels=labels)
    split = estimators.KFAC(model, variables, attention_qkv_split=True)
    split.update(x, labels=labels)

    name = "block0.attn/in_proj"
    e = 8
    gf = np.asarray(full.state[name]["g"])                 # [3E, 3E]
    gs = np.asarray(split.state[name]["g"])                # [3, E, E]
    for k in range(3):
        np.testing.assert_allclose(gs[k], gf[k*e:(k+1)*e, k*e:(k+1)*e],
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(split.state[name]["a"]),
                               np.asarray(full.state[name]["a"]),
                               rtol=1e-5, atol=1e-6)
    # every other layer's factors are identical
    for other in full.state:
        if other != name:
            np.testing.assert_allclose(np.asarray(split.state[other]["g"]),
                                       np.asarray(full.state[other]["g"]),
                                       rtol=1e-5, atol=1e-6)

    split.invert(add=0.5, multiply=2.0)
    # block Cholesky factors invert the damped per-block G
    gch = np.asarray(split.inv_state[name]["g_chol"])      # [3, E, E]
    for k in range(3):
        gd = np.sqrt(2.0) * gs[k] + np.sqrt(0.5) * np.eye(e)
        gd = (gd + gd.T) / 2
        np.testing.assert_allclose(gch[k] @ gch[k].T, np.linalg.inv(gd),
                                   rtol=1e-3, atol=1e-5)

    # sampler: [3E, cols] delta; manual per-block reconstruction matches
    key = jax.random.PRNGKey(7)
    delta = split.sample(key)[name]
    assert delta.shape == (3 * e, np.asarray(split.state[name]["a"]).shape[0])
    assert bool(jnp.all(jnp.isfinite(delta)))
    # posterior params apply cleanly through the packed layer
    params = split.posterior_params(jax.random.PRNGKey(8))
    logits, _ = model.apply({"params": params}, x, train=False)
    assert bool(jnp.all(jnp.isfinite(logits)))

    with pytest.raises(ValueError, match="split KFAC factors"):
        estimators.EFB(model, variables, split.state)


def test_kfac_attention_head_split():
    """attention_head_split refines the attention factor structure one
    level below qkv_split: in_proj G becomes [3, H, d, d] blocks equal to
    the per-head diagonal sub-blocks of the unsplit [3E, 3E] factor, and
    out_proj A becomes [H, d, d] input blocks plus a scalar bias block
    equal to the unsplit A's diagonal (reference: NotImplementedError for
    any attention factor, curvatures.py:303-304)."""
    model = models.tiny_transformer(vocab_free_dim=8, num_heads=2,
                                    num_layers=1, num_classes=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 5, 8))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 4)
    e, h = 8, 2
    d = e // h

    name_in = "block0.attn/in_proj"
    name_out = "block0.attn/out_proj"
    assert model.metas[name_in].heads == h
    assert model.metas[name_out].heads == h

    full = estimators.KFAC(model, variables)
    full.update(x, labels=labels)
    split = estimators.KFAC(model, variables, attention_head_split=True)
    split.update(x, labels=labels)

    gf = np.asarray(full.state[name_in]["g"])              # [3E, 3E]
    gs = np.asarray(split.state[name_in]["g"])             # [3, H, d, d]
    assert gs.shape == (3, h, d, d)
    for k in range(3):
        for hh in range(h):
            lo = k * e + hh * d
            np.testing.assert_allclose(gs[k, hh], gf[lo:lo+d, lo:lo+d],
                                       rtol=1e-5, atol=1e-6)

    af = np.asarray(full.state[name_out]["a"])             # [E+1, E+1]
    as_ = np.asarray(split.state[name_out]["a"])           # [H, d, d]
    assert as_.shape == (h, d, d)
    for hh in range(h):
        np.testing.assert_allclose(as_[hh],
                                   af[hh*d:(hh+1)*d, hh*d:(hh+1)*d],
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(split.state[name_out]["a_bias"]),
                               af[-1, -1], rtol=1e-5)
    # out_proj G and in_proj A are unchanged by the split
    np.testing.assert_allclose(np.asarray(split.state[name_out]["g"]),
                               np.asarray(full.state[name_out]["g"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(split.state[name_in]["a"]),
                               np.asarray(full.state[name_in]["a"]),
                               rtol=1e-5, atol=1e-6)

    split.invert(add=0.5, multiply=2.0)
    delta_in = split.sample(jax.random.PRNGKey(7))[name_in]
    assert delta_in.shape == (3 * e, e + 1)
    delta_out = split.sample(jax.random.PRNGKey(7))[name_out]
    assert delta_out.shape == (e, e + 1)
    params = split.posterior_params(jax.random.PRNGKey(8))
    logits, _ = model.apply({"params": params}, x, train=False)
    assert bool(jnp.all(jnp.isfinite(logits)))

    with pytest.raises(ValueError, match="split KFAC factors"):
        estimators.EFB(model, variables, split.state)


def test_kfac_subsample_offset_validation():
    """An offset outside [0, k) would silently bias (or NaN) the factors;
    the constructor rejects it (ADVICE r2)."""
    model = models.lenet5()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))
    with pytest.raises(ValueError, match="subsample_offset"):
        estimators.KFAC(model, variables, token_subsample=0.25,
                        subsample_offset=(2, 0))
    with pytest.raises(ValueError, match="subsample_offset"):
        estimators.KFAC(model, variables, subsample_offset=(0, 1))


def test_inf_rejects_qkv_split_factors(small_mlp):
    """INF mirrors EFB's guard: [3, E, E] split G factors must fail loudly
    at construction, not produce mis-shaped eigvecs (ADVICE r2)."""
    model, variables, x, labels = small_mlp
    kfac = _fit(estimators.KFAC, small_mlp)
    split_state = dict(kfac.state)
    name = next(iter(split_state))
    g = np.asarray(split_state[name]["g"])
    split_state[name] = {"a": split_state[name]["a"],
                         "g": jnp.stack([jnp.asarray(g)] * 3)}
    diags = {n: jnp.zeros((1, 1)) for n in split_state}
    lambdas = dict(diags)
    with pytest.raises(ValueError, match="split KFAC factors"):
        estimators.INF(model, variables, diags, split_state, lambdas)


def test_inf_eigvecs_lazy(small_mlp, monkeypatch):
    """Constructing INF and running invert/sample from a pre-built low-rank
    state must NOT eigendecompose the full KFAC factors: the evaluate/hyper
    pipelines load saved state and never call update(), and the eager eigh
    was the pointless-at-eval-time work diagnosed in benchmarks/NOTES.md
    (round 3). update() still triggers it on first use."""
    model, variables, x, labels = small_mlp
    diag = _fit(estimators.Diagonal, small_mlp)
    kfac = _fit(estimators.KFAC, small_mlp)
    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)

    built = estimators.INF(model, variables, diag.state, kfac.state,
                           efb.state)
    built.update(rank=7)
    saved_state = built.state

    from curvature_tpu.estimators import inf as inf_mod
    calls = []
    real = inf_mod.kfac_eigenvectors
    monkeypatch.setattr(inf_mod, "kfac_eigenvectors",
                        lambda st: calls.append(1) or real(st))

    est = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    est.state = saved_state            # the pipelines' load path
    est.invert(add=1.0, multiply=10.0)
    sample = est.sample(jax.random.PRNGKey(0))
    assert all(bool(jnp.isfinite(v).all()) for v in sample.values())
    assert not calls, "invert/sample must not touch the full eigvecs"

    est.update(rank=7)                 # first real use computes them once
    assert len(calls) == 1


def test_kfac_fused_g_parity(small_mlp):
    """fused_g=True (gram-tap backward) reproduces the probe-path factors
    exactly: the tap's backward computes the same token Gram the einsum
    path computes from materialized probe gradients."""
    model, variables, x, labels = small_mlp
    a = estimators.KFAC(model, variables)
    a.update(x, labels=labels)
    b = estimators.KFAC(model, variables, fused_g=True)
    assert b.gram_probe_names == set(b.metas)
    b.update(x, labels=labels)
    for name in a.state:
        for key in ("a", "g"):
            np.testing.assert_allclose(np.asarray(a.state[name][key]),
                                       np.asarray(b.state[name][key]),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_kfac_fused_g_parity_conv_and_lm():
    """Fused-G parity on a conv net (spatial token axes) and a causal LM
    (per-token Fisher, [B, T, V] logits), through the jitted update."""
    rng = jax.random.PRNGKey(0)
    model = models.lenet5()
    x = jax.random.normal(rng, (8, 28, 28, 1))
    variables = model.init(rng, x)
    a = estimators.KFAC(model, variables)
    b = estimators.KFAC(model, variables, fused_g=True)
    a.update(x, rng=jax.random.PRNGKey(2), num_samples=2)
    b.update(x, rng=jax.random.PRNGKey(2), num_samples=2)
    for name in a.state:
        np.testing.assert_allclose(np.asarray(a.state[name]["g"]),
                                   np.asarray(b.state[name]["g"]),
                                   rtol=1e-5, atol=1e-6)

    lm = models.gpt2_custom(32, 16, 2, 2, 8)
    tok = jax.random.randint(rng, (4, 8), 0, 32)
    lv = lm.init(rng, tok)
    la = estimators.KFAC(lm, lv, loss="lm")
    lb = estimators.KFAC(lm, lv, loss="lm", fused_g=True)
    la.update(tok, rng=jax.random.PRNGKey(3), num_samples=1)
    lb.update(tok, rng=jax.random.PRNGKey(3), num_samples=1)
    for name in la.state:
        np.testing.assert_allclose(np.asarray(la.state[name]["g"]),
                                   np.asarray(lb.state[name]["g"]),
                                   rtol=1e-5, atol=1e-6)


def test_kfac_fused_g_excludes_subsampled_convs():
    """token_subsample < 1 keeps conv layers on the probe path (strided
    token grids need the raw gradient) while dense layers stay fused —
    and the mixed capture still matches the full-probe estimator."""
    rng = jax.random.PRNGKey(0)
    model = models.lenet5()
    x = jax.random.normal(rng, (8, 28, 28, 1))
    variables = model.init(rng, x)
    a = estimators.KFAC(model, variables, token_subsample=0.25)
    b = estimators.KFAC(model, variables, token_subsample=0.25,
                        fused_g=True)
    fused = b.gram_probe_names
    assert fused and all(b.metas[n].kind == "dense" for n in fused)
    a.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    b.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    for name in a.state:
        np.testing.assert_allclose(np.asarray(a.state[name]["g"]),
                                   np.asarray(b.state[name]["g"]),
                                   rtol=1e-5, atol=1e-6)
