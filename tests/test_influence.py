"""Inverse-vector products (precision_solve) and influence functions.

The solve is validated against the independently dense-parity-tested
quadratic form on EVERY estimator, twice over:

  * ``quadratic_form(solve(v)) == <v, solve(v)>`` — both equal
    ``v^T P^{-1} v`` iff solve applies the same precision quad measures;
  * full roundtrip ``solve(P v) == v`` with ``P v`` obtained as the exact
    gradient of ``0.5 * quad_state`` — no dense matrix is ever built, yet
    the identity pins the solve to quad's P bit-for-bit in structure.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models, nn
from curvature_tpu.eval.influence import (influence_scores,
                                          self_influence)

ADD, MULT = 0.7, 3.0


@pytest.fixture(scope="module")
def setup():
    model = models.mlp([7], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 5))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 4)
    return model, variables, x, labels


class _GroupedSolveNet(nn.Module):
    """conv -> grouped conv -> depthwise conv -> fc: exercises the
    per-group [g, ...] factor layouts in every solve_state."""

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
def setup_grouped():
    model = nn.Model(_GroupedSolveNet())
    x = jax.random.normal(jax.random.key(0), (4, 6, 6, 3))
    variables = model.init(jax.random.key(1), x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 5)
    return model, variables, x, labels


@pytest.fixture(scope="module")
def setup_stacked():
    """Depth-scanned ViT: [depth, ...]-stacked factor state exercises the
    stacked vmap/einsum branches in every solve_state."""
    from curvature_tpu.models.vit import vit
    model = vit(image_size=16, patch_size=8, dim=16, depth=3, heads=2,
                mlp_dim=32, num_classes=5, scan_blocks=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 0, 5)
    return model, variables, x, labels


def _fit(name, setup):
    model, variables, x, labels = setup
    if name == "diag":
        est = estimators.Diagonal(model, variables)
    elif name == "block":
        est = estimators.BlockDiagonal(model, variables)
    elif name == "kfac":
        est = estimators.KFAC(model, variables)
    elif name == "efb":
        kfac = estimators.KFAC(model, variables)
        kfac.update(x, labels=labels)
        est = estimators.EFB(model, variables, kfac.state)
    elif name == "inf":
        kfac = estimators.KFAC(model, variables)
        kfac.update(x, labels=labels)
        efb = estimators.EFB(model, variables, kfac.state)
        efb.update(x, labels=labels)
        diag = estimators.Diagonal(model, variables)
        diag.update(x, labels=labels)
        est = estimators.INF(model, variables, diag.state, kfac.state,
                             efb.state, eigvecs=efb.eigvecs)
        est.update(rank=10)
        return est
    elif name == "subspace":
        est = estimators.Subspace(model, variables, rank=12)
        est.update(x, rng=jax.random.PRNGKey(2))
        return est
    else:
        raise ValueError(name)
    est.update(x, labels=labels)
    return est


ALL = ["diag", "block", "kfac", "efb", "inf", "subspace"]


def _probe(est, seed=0):
    from curvature_tpu.ops.matfree import delta_shapes
    rng = np.random.default_rng(seed)
    return {n: jnp.asarray(rng.normal(size=s), jnp.float32)
            for n, s in delta_shapes(est.metas).items()}


ARCHS = ["mlp", "grouped", "stacked"]


def _arch_setup(arch, request):
    return request.getfixturevalue(
        {"mlp": "setup", "grouped": "setup_grouped",
         "stacked": "setup_stacked"}[arch])


@pytest.mark.parametrize("name", ALL)
def test_solve_matches_quadratic_form(name, setup):
    est = _fit(name, setup)
    v = _probe(est)
    u = est.precision_solve(v, ADD, MULT)
    inner = sum(float(jnp.vdot(v[n], u[n])) for n in est.metas)
    q = est.quadratic_form(u, ADD, MULT)       # u^T P u = v^T P^{-1} v
    np.testing.assert_allclose(q, inner, rtol=2e-3)
    assert inner > 0                            # P^{-1} is PD


@pytest.mark.parametrize("arch", ARCHS)
@pytest.mark.parametrize("name", ALL)
def test_solve_roundtrip_against_quad_gradient(name, arch, setup, request):
    """solve(P v) == v with P v = grad(0.5 * quad_state)(v).

    Parametrized over grouped-conv and depth-stacked (ScanBlocks) models in
    addition to the MLP (round-4 advisor): the grouped/stacked einsum and
    vmap branches in KFAC/EFB/INF/BlockDiagonal.solve_state are only live
    on those architectures."""
    from curvature_tpu.estimators.base import normalize_damping
    est = _fit(name, _arch_setup(arch, request))
    add, mult = normalize_damping(ADD, MULT, len(est.metas))
    v = _probe(est, seed=1)
    pv = jax.grad(lambda d: 0.5 * est.quad_state(est.state, add, mult, d))(v)
    back = est.precision_solve(pv, ADD, MULT)
    for n in est.metas:
        np.testing.assert_allclose(np.asarray(back[n]), np.asarray(v[n]),
                                   rtol=2e-3, atol=2e-4)


def test_influence_self_pair_is_helpful(setup):
    """A training example's influence on its own test loss is negative
    (P^{-1} is PD, so upweighting an example always helps itself)."""
    model, variables, x, _ = setup
    y = np.asarray(jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4))
    est = estimators.KFAC(model, variables)
    est.update(x, labels=jnp.asarray(y)[None])
    scores = influence_scores(est, x, y, x[3:4], y[3:4],
                              add=ADD, multiply=MULT)
    assert scores.shape == (16,)
    assert float(scores[3]) < 0


def test_self_influence_positive(setup):
    model, variables, x, _ = setup
    y = np.asarray(jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4))
    est = estimators.Diagonal(model, variables)
    est.update(x, labels=jnp.asarray(y)[None])
    s = self_influence(est, x, y, add=ADD, multiply=MULT)
    assert s.shape == (16,) and (np.asarray(s) > 0).all()


def test_influence_matches_manual_inner_product(setup):
    """influence == -<g_i, P^{-1} g_test> assembled by hand from the
    exported gradient helpers."""
    from curvature_tpu.eval.influence import (loss_grad_matrix,
                                              per_example_grad_matrix)
    model, variables, x, _ = setup
    y = np.asarray(jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4))
    est = estimators.BlockDiagonal(model, variables)
    est.update(x, labels=jnp.asarray(y)[None])
    scores = influence_scores(est, x, y, x[:2], y[:2],
                              add=ADD, multiply=MULT)
    g_test = loss_grad_matrix(model, est.metas, variables, x[:2], y[:2])
    solved = est.precision_solve(g_test, ADD, MULT)
    grads = per_example_grad_matrix(model, est.metas, variables, x, y)
    want = -sum(np.asarray(jnp.einsum("n...,...->n", grads[n], solved[n]))
                for n in est.metas)
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5)
