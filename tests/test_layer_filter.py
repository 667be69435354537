"""Subnetwork / last-layer Laplace via ``layer_filter`` (extension beyond
the reference, whose layer selection is by type only, curvatures.py:57-63).

Key invariants: (a) a filtered estimator produces factor entries identical
to the corresponding entries of a full fit (factors are per-layer
independent sums); (b) posterior sampling perturbs ONLY the tracked
layers; (c) the --layers CLI flag round-trips through factors -> evaluate
and fails loudly on a filter mismatch.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.estimators.base import filter_metas


@pytest.fixture(scope="module")
def small_mlp():
    model = models.mlp([7, 6], 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 5))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 4)
    return model, variables, x, labels


def test_filter_metas_semantics(small_mlp):
    model = small_mlp[0]
    metas = model.metas
    assert list(filter_metas(metas, None)) == list(metas)
    assert list(filter_metas(metas, "last")) == [list(metas)[-1]]
    assert list(filter_metas(metas, ["fc1", "fc3"])) == ["fc1", "fc3"]
    assert list(filter_metas(metas, "fc*")) == list(metas)
    with pytest.raises(ValueError, match="matches none"):
        filter_metas(metas, ["nope*"])


def test_last_layer_posterior_only_perturbs_last(small_mlp):
    model, variables, x, labels = small_mlp
    est = estimators.KFAC(model, variables, layer_filter="last")
    assert list(est.metas) == ["fc3"]
    est.update(x, labels=labels)
    est.invert(0.3, 2.0)
    p = est.posterior_params(jax.random.PRNGKey(2))
    for layer, group in variables["params"].items():
        for leaf, v in group.items():
            same = np.allclose(np.asarray(p[layer][leaf]), np.asarray(v))
            assert same == (layer != "fc3"), (layer, leaf)


@pytest.mark.parametrize("cls", [estimators.Diagonal, estimators.KFAC,
                                 estimators.BlockDiagonal])
def test_filtered_factors_match_full_fit(small_mlp, cls):
    model, variables, x, labels = small_mlp
    full = cls(model, variables)
    full.update(x, labels=labels)
    part = cls(model, variables, layer_filter=["fc2"])
    part.update(x, labels=labels)
    assert list(part.state) == ["fc2"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        part.state["fc2"], full.state["fc2"])


def test_efb_and_inf_accept_full_state_with_filter(small_mlp):
    """EFB/INF built from FULL-network factor files but tracking a subset:
    the constructors subset the inputs instead of eigendecomposing (or
    Woodbury-building) untracked layers."""
    model, variables, x, labels = small_mlp
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)
    diag = estimators.Diagonal(model, variables)
    diag.update(x, labels=labels)
    efb_full = estimators.EFB(model, variables, kfac.state)
    efb_full.update(x, labels=labels)

    efb = estimators.EFB(model, variables, kfac.state, layer_filter="last")
    assert list(efb.metas) == ["fc3"] and list(efb.eigvecs) == ["fc3"]
    efb.update(x, labels=labels)
    np.testing.assert_allclose(efb.state["fc3"], efb_full.state["fc3"],
                               rtol=1e-5, atol=1e-7)

    inf = estimators.INF(model, variables, diag.state, kfac.state,
                         efb_full.state, layer_filter="last")
    assert list(inf.metas) == ["fc3"]
    inf.update(rank=10)
    assert list(inf.state) == ["fc3"]
    inf.invert(0.1, 1.0)
    deltas = inf.sample(jax.random.PRNGKey(3))
    assert list(deltas) == ["fc3"]
    assert np.isfinite(np.asarray(deltas["fc3"])).all()


@pytest.mark.slow
def test_cli_layers_roundtrip(tmp_path):
    """factors --layers last -> evaluate --layers last works; evaluate
    without the filter fails loudly on the missing layers."""
    from curvature_tpu.utils.config import Config
    from curvature_tpu.pipelines import factors as factors_pipe
    from curvature_tpu.pipelines import evaluate as eval_pipe
    from curvature_tpu.pipelines import training as train_pipe

    root = str(tmp_path)
    cfg = Config(root_dir=root, results_dir=root, model="lenet5",
                 data="synthetic", batch_size=32, epochs=1, samples=2,
                 mc_samples=1, seed=0, layers="last",
                 norm=1.0, scale=1.0, ood=True, no_results=True)
    train_pipe.run(dataclasses.replace(cfg, lr=1e-2))
    est = factors_pipe.run(dataclasses.replace(cfg, estimator="kfac"))
    assert len(est.state) == 1
    eval_pipe.run(dataclasses.replace(cfg, estimator="kfac"))

    with pytest.raises(ValueError, match="lack layers"):
        eval_pipe.run(dataclasses.replace(cfg, estimator="kfac", layers=""))
