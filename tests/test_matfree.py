"""Matrix-free exact-curvature operators (ops/matfree.py) and the estimator
fidelity report (eval/fidelity.py).

Ground truth is the densely materialized GGN built from an explicit Jacobian
in the tracked matrix-view coordinates — small models only, which is exactly
why the matrix-free operators exist for everything larger.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from curvature_tpu import estimators, models
from curvature_tpu.eval.fidelity import fidelity_report
from curvature_tpu.nn.core import apply_matrix_delta
from curvature_tpu.ops.matfree import (delta_shapes, ggn_matvec, ggn_quad,
                                       hutchinson_trace, lanczos_topk,
                                       random_deltas)


@pytest.fixture(scope="module")
def tiny(request):
    model = models.mlp([3], 2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 4))
    variables = model.init(rng, x)
    return model, variables, x


def _dense_ggn(model, metas, variables, x, loss):
    """[p, p] GGN in matrix-view coordinates via an explicit Jacobian."""
    shapes = delta_shapes(metas)
    zeros = {n: jnp.zeros(s, jnp.float32) for n, s in shapes.items()}
    flat0, unravel = ravel_pytree(zeros)

    def f(flat):
        params = apply_matrix_delta(metas, variables["params"],
                                    unravel(flat))
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            x, train=True)
        return out

    jac = jax.jacobian(f)(flat0)                      # [B, K, p]
    logits = f(flat0)
    if loss == "gaussian":
        h = jnp.broadcast_to(jnp.eye(logits.shape[-1]),
                             (logits.shape[0],) + (logits.shape[-1],) * 2)
    else:
        p = jax.nn.softmax(logits, axis=-1)
        h = jax.vmap(lambda q: jnp.diag(q) - jnp.outer(q, q))(p)
    return jnp.einsum("bkp,bkl,blq->pq", jac, h, jac) / x.shape[0], unravel


@pytest.mark.parametrize("loss", ["cross_entropy", "gaussian"])
def test_ggn_matvec_dense_parity(tiny, loss):
    model, variables, x = tiny
    est = estimators.Diagonal(model, variables, loss=loss)
    metas = est.metas
    dense, unravel = _dense_ggn(model, metas, variables, x, loss)

    flat0, _ = ravel_pytree(
        {n: jnp.zeros(s, jnp.float32)
         for n, s in delta_shapes(metas).items()})
    cols = []
    for i in range(flat0.shape[0]):
        v = unravel(flat0.at[i].set(1.0))
        out = ggn_matvec(model, metas, variables, x, v, loss=loss)
        cols.append(np.asarray(ravel_pytree(out)[0]))
    materialized = np.stack(cols, axis=1)
    np.testing.assert_allclose(materialized, np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_ggn_quad_matches_matvec(tiny):
    model, variables, x = tiny
    est = estimators.Diagonal(model, variables)
    metas = est.metas
    v = random_deltas(metas, jax.random.PRNGKey(3), kind="normal")
    q = float(ggn_quad(model, metas, variables, x, v))
    fv = ggn_matvec(model, metas, variables, x, v)
    dot = float(sum(jnp.vdot(v[n], fv[n]) for n in metas))
    assert q >= 0.0
    np.testing.assert_allclose(q, dot, rtol=1e-5)


def test_ggn_matvec_symmetric(tiny):
    model, variables, x = tiny
    est = estimators.Diagonal(model, variables)
    metas = est.metas
    v = random_deltas(metas, jax.random.PRNGKey(4), kind="normal")
    w = random_deltas(metas, jax.random.PRNGKey(5), kind="normal")
    fv = ggn_matvec(model, metas, variables, x, v)
    fw = ggn_matvec(model, metas, variables, x, w)
    lhs = float(sum(jnp.vdot(w[n], fv[n]) for n in metas))
    rhs = float(sum(jnp.vdot(v[n], fw[n]) for n in metas))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_lanczos_topk_dense_parity(tiny):
    # gaussian loss: rank(J^T J) covers the full 23-dim tracked block, so
    # p Lanczos steps reproduce the whole spectrum
    model, variables, x = tiny
    est = estimators.Diagonal(model, variables, loss="gaussian")
    metas = est.metas
    dense, _ = _dense_ggn(model, metas, variables, x, "gaussian")
    p = dense.shape[0]

    def matvec(d):
        return ggn_matvec(model, metas, variables, x, d, loss="gaussian")

    example = {n: jnp.zeros(s, jnp.float32)
               for n, s in delta_shapes(metas).items()}
    ritz, weights = lanczos_topk(matvec, example, p, jax.random.PRNGKey(7))
    evals = np.sort(np.asarray(jnp.linalg.eigvalsh(dense)))[::-1]
    np.testing.assert_allclose(np.asarray(ritz)[:5], evals[:5],
                               rtol=1e-4, atol=1e-6)
    assert float(jnp.sum(weights)) == pytest.approx(1.0, rel=1e-4)


def test_hutchinson_trace(tiny):
    model, variables, x = tiny
    est = estimators.Diagonal(model, variables)
    metas = est.metas
    dense, _ = _dense_ggn(model, metas, variables, x, "cross_entropy")

    def quad(d):
        return ggn_quad(model, metas, variables, x, d)

    tr = float(hutchinson_trace(quad, metas, jax.random.PRNGKey(11),
                                num_probes=256))
    np.testing.assert_allclose(tr, float(jnp.trace(dense)), rtol=0.15)


@pytest.mark.slow
def test_fidelity_block_converges_diag_structural(tiny):
    """BlockDiagonal's state/(S) converges to the exact block Fisher (only
    MC noise remains); Diagonal carries structural error on top."""
    model, variables, x = tiny
    samples = 2000
    block = estimators.BlockDiagonal(model, variables)
    block.update(x, rng=jax.random.PRNGKey(0), num_samples=samples)
    rep = fidelity_report(block, x, jax.random.PRNGKey(1), num_probes=6,
                          norm=float(samples))
    for name, r in rep.items():
        assert r["rel_err"] < 0.15, (name, r)
        # the LS fit cannot be worse than the calibrated-norm error
        assert r["scaled_rel_err"] <= r["rel_err"] + 1e-9

    diag = estimators.Diagonal(model, variables)
    diag.update(x, rng=jax.random.PRNGKey(0), num_samples=samples)
    drep = fidelity_report(diag, x, jax.random.PRNGKey(1), num_probes=6,
                           norm=float(samples))
    # diagonal structural error dominates block's MC-only error overall
    d_err = np.mean([r["scaled_rel_err"] for r in drep.values()])
    b_err = np.mean([r["scaled_rel_err"] for r in rep.values()])
    assert d_err > b_err


def test_fidelity_kfac_scale_free(tiny):
    """KFAC's raw scale is update-count-quadratic; the LS-fit residual is
    the meaningful (scale-free) number and must beat Diagonal's."""
    model, variables, x = tiny
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, rng=jax.random.PRNGKey(0), num_samples=500)
    rep = fidelity_report(kfac, x, jax.random.PRNGKey(1), num_probes=8,
                          norm=500.0)
    for name, r in rep.items():
        assert np.isfinite(r["scaled_rel_err"]), (name, r)
        assert r["alpha"] > 0.0


def test_fidelity_unknown_layer_raises(tiny):
    model, variables, x = tiny
    est = estimators.Diagonal(model, variables)
    est.update(x, rng=jax.random.PRNGKey(0), num_samples=1)
    with pytest.raises(ValueError, match="not tracked"):
        fidelity_report(est, x, jax.random.PRNGKey(1), layers=["nope"])


@pytest.mark.slow
def test_ggn_quad_transformer_smoke():
    """Attention models (stacked scan metas excluded — plain blocks) run
    through the operators and stay PSD."""
    model = models.tiny_transformer()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 6, 16))
    variables = model.init(rng, x)
    est = estimators.Diagonal(model, variables)
    metas = est.metas
    v = random_deltas(metas, jax.random.PRNGKey(2), kind="normal")
    q = float(ggn_quad(model, metas, variables, x, v))
    assert np.isfinite(q) and q >= 0.0
    fv = ggn_matvec(model, metas, variables, x, v)
    dot = float(sum(jnp.vdot(v[n], fv[n]) for n in metas))
    np.testing.assert_allclose(q, dot, rtol=1e-4)
