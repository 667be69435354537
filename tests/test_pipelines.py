"""End-to-end pipeline integration on synthetic data in a tmp workspace:
training -> factors (diag/kfac/efb/inf) -> hyperopt -> evaluate (OOD + FGSM)
-> loss landscape -> visualize. Mirrors the reference's pipeline order
(README.rst:226-244)."""
import dataclasses
import os

import numpy as np
import pytest

from curvature_tpu.utils.config import Config
from curvature_tpu.utils.checkpoint import factors_path
from curvature_tpu.pipelines import (factors as factors_pipe)
from curvature_tpu.pipelines import evaluate as eval_pipe
from curvature_tpu.pipelines import hyper as hyper_pipe
from curvature_tpu.pipelines import loss_landscape as loss_pipe
from curvature_tpu.pipelines import training as train_pipe
from curvature_tpu.pipelines import visualize as viz_pipe

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ws"))
    cfg = Config(root_dir=root, results_dir=root, model="lenet5",
                 data="synthetic", batch_size=64, epochs=1, samples=3,
                 mc_samples=2, calls=3, rank=20, seed=0)
    return cfg


@pytest.fixture(scope="module")
def trained(workspace):
    cfg = dataclasses.replace(workspace, epochs=1, lr=1e-2)
    variables, history = train_pipe.run(cfg)
    assert os.path.exists(os.path.join(cfg.root_dir, "weights",
                                       "lenet5_synthetic.npz"))
    assert np.isfinite(history["loss"]).all()
    return workspace


@pytest.fixture(scope="module")
def factored(trained):
    """Factors for all four estimators saved in the workspace — a fixture
    (not test-order side effects) so every dependent test runs standalone
    under -k selection."""
    for est in ("diag", "kfac", "efb", "inf"):
        c = dataclasses.replace(trained, estimator=est)
        result = factors_pipe.run(c)
        assert result.state, est
    return trained


def test_factors_all_estimators(factored):
    cfg = factored
    assert os.path.exists(factors_path(cfg, "kfac") + ".npz")
    assert os.path.exists(factors_path(cfg, "diag") + ".npz")
    assert os.path.exists(factors_path(cfg, "efb") + ".npz")
    assert os.path.exists(factors_path(cfg, "inf", rank="20") + ".npz")


@pytest.fixture(scope="module")
def hypered(factored):
    """Best-params artifact for the evaluate fallback test — a fixture so
    `-k` selection of downstream tests works standalone."""
    cfg = dataclasses.replace(factored, estimator="kfac", optimizer="random",
                              calls=3)
    out = hyper_pipe.run(cfg)
    return factored, out


def test_hyper_random(hypered):
    cfg, out = hypered
    assert len(out["stats"]["cost"]) >= 3
    best_params = os.path.join(cfg.results_dir, cfg.model, "data", "kfac",
                               "lenet5_synthetic_best_params.npy")
    assert os.path.exists(best_params)


def test_factors_fidelity_spectrum_cli(trained):
    """--fidelity / --spectrum: exact-curvature diagnostics saved next to
    the factor artifact (matrix-free GGN, ops/matfree.py — no reference
    analogue). Uses a distinct suffix so the shared factor artifacts the
    other tests consume are untouched."""
    cfg = dataclasses.replace(trained, estimator="kfac", suffix="_diag2",
                              fidelity=2, spectrum=8)
    factors_pipe.run(cfg)
    rep = np.load(factors_path(cfg) + "_fidelity.npz")
    assert rep.files and all(np.isfinite(rep[k]) for k in rep.files)
    # the scale-free structural error is the meaningful KFAC column
    errs = [float(rep[k]) for k in rep.files if k.endswith("scaled_rel_err")]
    assert errs and all(e < 10.0 for e in errs)
    spec = np.load(factors_path(cfg) + "_spectrum.npz")
    ritz = spec["ritz"]
    assert ritz.shape == (8,) and np.isfinite(ritz).all()
    assert float(ritz.min()) > -1e-4           # PSD up to f32 roundoff
    assert float(spec["weights"].sum()) == pytest.approx(1.0, rel=1e-3)


def test_factors_subsample_and_bf16_cli(trained):
    """--token_subsample and --precision bfloat16 reach the factors CLI
    (the two measured ResNet-50 update levers, benchmarks/NOTES.md); the
    subsample flag is KFAC-only and fails loudly elsewhere."""
    cfg = dataclasses.replace(trained, estimator="kfac", suffix="_sub",
                              token_subsample=0.25, precision="bfloat16")
    est = factors_pipe.run(cfg)
    for fac in est.state.values():
        for v in fac.values():
            assert np.isfinite(np.asarray(v)).all()
            assert np.asarray(v).dtype == np.float32   # f32 accumulation
    with pytest.raises(ValueError, match="KFAC"):
        factors_pipe.run(dataclasses.replace(trained, estimator="diag",
                                             token_subsample=0.5))


def test_hyper_gp(factored):
    cfg = dataclasses.replace(factored, estimator="diag", optimizer="gp",
                              calls=4)
    out = hyper_pipe.run(cfg)
    assert np.isfinite(out["best_cost"])


def test_evaluate_ood_with_best_params(hypered):
    """norm/scale default to -1 -> best-params fallback (evaluate.py:373-377)."""
    cfg = dataclasses.replace(hypered[0], estimator="kfac", ood=True)
    preds, bnn_preds, labels = eval_pipe.run(cfg)
    assert preds.shape == bnn_preds.shape
    results_path = os.path.join(cfg.results_dir, cfg.model, "data", "kfac",
                                "lenet5_synthetic.npz")
    assert os.path.exists(results_path)


def test_evaluate_ood_inf(factored):
    cfg = dataclasses.replace(factored, estimator="inf", ood=True,
                              norm=1e3, scale=1e2)
    preds, bnn_preds, labels = eval_pipe.run(cfg)
    assert np.isfinite(bnn_preds).all()


def test_evaluate_alternate_predictives(factored):
    """--predictive linearized / probit route the BNN pass through the GLM
    and closed-form predictives (extension; eval/predictive.py); --stats
    with a non-sampled predictive fails loudly."""
    for kind in ("linearized", "probit", "linearized_probit"):
        cfg = dataclasses.replace(factored, estimator="kfac", ood=True,
                                  norm=10.0, scale=100.0, predictive=kind,
                                  no_results=True)
        preds, bnn_preds, labels = eval_pipe.run(cfg)
        assert preds.shape == bnn_preds.shape
        np.testing.assert_allclose(bnn_preds.sum(1), 1.0, rtol=1e-4)
    cfg = dataclasses.replace(factored, estimator="kfac", ood=True,
                              norm=10.0, scale=100.0,
                              predictive="linearized", stats=True)
    with pytest.raises(ValueError, match="--stats"):
        eval_pipe.run(cfg)
    cfg = dataclasses.replace(factored, estimator="kfac", ood=True,
                              norm=10.0, scale=100.0,
                              predictive="probit", sample_chunk=2)
    with pytest.raises(ValueError, match="--sample_chunk"):
        eval_pipe.run(cfg)


def test_evaluate_fgsm_single_step(factored):
    cfg = dataclasses.replace(factored, estimator="kfac", fgsm=True,
                              epsilon=0.1, norm=10.0, scale=100.0)
    stats = eval_pipe.run(cfg)
    assert np.isfinite(stats["acc"])


def test_loss_landscape_1d_resumable(trained):
    cfg = dataclasses.replace(trained, estimator="kfac")
    res = loss_pipe.run(dataclasses.replace(cfg, loss1d=True))
    assert np.isfinite(res["train_loss"]).all()
    # center of the scan is the trained model: loss should be near-minimal
    mid = len(res["train_loss"]) // 2
    assert res["train_loss"][mid] <= res["train_loss"][0] + 1e-6 or \
        res["train_loss"][mid] <= np.median(res["train_loss"])
    # resume path: second run loads the cached file without recompute
    res2 = loss_pipe.run(dataclasses.replace(cfg, loss1d=True))
    np.testing.assert_array_equal(res["train_loss"], res2["train_loss"])


def test_visualize(factored):
    cfg = dataclasses.replace(factored, estimator="kfac", calibration=True,
                              ood=True, eigvals=True, hyper=True,
                              summary=True, landscapes=True)
    viz_pipe.run(cfg)
    fig_dir = os.path.join(cfg.results_dir, cfg.model, "figures", "kfac")
    assert any(f.endswith(".pdf") for f in os.listdir(fig_dir))


def test_batched_evaluator_matches_sequential(factored):
    """The vmapped candidate evaluator agrees with the sequential objective
    on identical candidates (same posterior, MC noise tolerance)."""
    import jax
    from curvature_tpu.pipelines.common import build_data, build_model
    from curvature_tpu.pipelines.evaluate import load_estimator
    cfg = dataclasses.replace(factored, estimator="kfac", samples=6)
    model, variables = build_model(cfg)
    val = list(build_data(cfg, splits="val"))
    est = load_estimator(cfg, model, variables)

    evaluator = hyper_pipe.make_batched_evaluator(cfg, model, variables, est,
                                                  val)
    res = evaluator([10.0, 1e6], [100.0, 1e4], jax.random.PRNGKey(0))
    assert len(res) == 2
    for r in res:
        assert np.isfinite(r["cost"])

    stats = {k: [] for k in ("norms", "scales", "acc", "ece", "nll", "ent",
                             "cost")}
    objective = hyper_pipe.make_objective(cfg, model, variables, est, val,
                                          stats, "")
    seq_cost = objective(1.0, 2.0)       # log10: norm=10, scale=100
    assert abs(seq_cost - res[0]["cost"]) < 30.0  # MC noise tolerance


def test_hyper_batched_efb(factored):
    """Batched damping search through EFB's wrapped inverse state."""
    cfg = dataclasses.replace(factored, estimator="efb", optimizer="random",
                              calls=2, samples=2)
    out = hyper_pipe.run(cfg)
    assert np.isfinite(out["best_cost"])


def test_zoo_reachable_from_cli(tmp_path):
    """Every registry model constructs through build_model, and a non-resnet
    zoo model runs factors end to end (the reference reaches its zoo via
    getattr(torchvision.models, name), factors.py:80-84)."""
    from curvature_tpu import models as M
    from curvature_tpu.pipelines.common import build_model, input_shape

    assert {"densenet121", "densenet161", "densenet169", "densenet201",
            "vgg11", "vgg16", "vgg19_bn", "googlenet"} <= set(M.MODEL_REGISTRY)
    with pytest.raises(ValueError, match="available"):
        M.build("not_a_zoo_model")

    # googlenet was special-cased to 299px by the reference (its own
    # factors.py:106-107); torchvision GoogLeNet is a 224 model — fixed here
    assert input_shape("imagenet", "googlenet") == (224, 224, 3)
    assert input_shape("imagenet", "inception_v3") == (299, 299, 3)

    cfg = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                 model="googlenet", data="synthetic", batch_size=64,
                 epochs=1, mc_samples=1, scan_chunk=4, seed=0)
    model, variables = build_model(cfg)
    assert "inception5b.branch1.conv" in model.metas
    est = factors_pipe.run(cfg)
    assert os.path.exists(factors_path(cfg) + ".npz")
    a = np.asarray(est.state["inception3a.branch1.conv"]["a"])
    assert np.isfinite(a).all() and a.any()


def test_calibration_swa_swag_overlay(tmp_path):
    """External SWA/SWAG baseline archives overlay onto the calibration
    comparison (reference visualize.py:105-113)."""
    from curvature_tpu.pipelines.visualize import calibration_comparison
    from curvature_tpu.utils.checkpoint import results_paths

    rng = np.random.default_rng(0)
    cfg = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                 model="lenet5", data="synthetic", estimator="kfac")
    labels = rng.integers(0, 10, size=(64,))
    probs = rng.random((64, 10)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)

    for est, keys in [("kfac", ("predictions", "bnn_predictions")),
                      ("swa", ("predictions",)),
                      ("swag", ("bnn_predictions",))]:
        c = dataclasses.replace(cfg, estimator=est)
        path, _ = results_paths(c)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(path + ".npz", labels=labels,
                            **{k: probs for k in keys})

    fig = calibration_comparison(cfg)
    legend_labels = [t.get_text() for t in fig.axes[0].get_legend().get_texts()] \
        if fig.axes[0].get_legend() else \
        [l.get_label() for l in fig.axes[0].get_lines()]
    joined = " ".join(legend_labels)
    assert "SWA" in joined and "SWAG" in joined and "BNN-KFAC" in joined


def test_hyper_per_layer_search(factored):
    """--layer runs a true per-layer damping search (coordinate descent via
    the batched evaluator) and is monotone vs its shared-damping init."""
    cfg = dataclasses.replace(factored, estimator="kfac", layer=True,
                              calls=4, samples=3)
    if not os.path.exists(factors_path(cfg) + ".npz"):
        factors_pipe.run(cfg)           # standalone-run support
    out = hyper_pipe.run(cfg)
    stats = out["stats"]
    shared_phase_best = min(stats["cost"][:4])
    assert out["best_cost"] <= shared_phase_best + 1e-9
    # the search actually explored per-layer-varying dampings
    assert any(len(set(map(float, row))) > 1 for row in stats["norms"])
    # artifacts: layer-stats file + best params usable by evaluate
    layer_stats = os.path.join(cfg.results_dir, cfg.model, "data", "kfac",
                               "random", "lenet5_synthetic_hyperopt_stats_layer.npy")
    assert os.path.exists(layer_stats)


def test_lm_checkpoint_wpe_prefix_slice(tmp_path):
    """A converted HF GPT-2 checkpoint carries the full 1024-row position
    table; loading it at a shorter --seq_len must slice wpe[:seq_len]
    (standard practice) rather than raise, while any genuinely
    incompatible dim still fails loudly."""
    import jax
    from curvature_tpu import models as M
    from curvature_tpu.pipelines.common import build_model
    from curvature_tpu.utils.checkpoint import save_pytree

    donor = M.gpt2_tiny(max_len=64)
    variables = donor.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64), np.int32))
    ckpt = jax.tree_util.tree_map(np.asarray, variables)
    assert ckpt["params"]["wpe"]["weight"].shape[0] == 64
    path = os.path.join(str(tmp_path), "weights", "gpt2_tiny_tokens.npz")
    save_pytree(path, ckpt)

    cfg = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                 model="gpt2_tiny", data="tokens", seq_len=16, seed=0)
    model, loaded = build_model(cfg)
    assert loaded["params"]["wpe"]["weight"].shape[0] == 16
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["wpe"]["weight"]),
        ckpt["params"]["wpe"]["weight"][:16])
    out, _ = model.apply(loaded, np.zeros((2, 16), np.int32), train=False)
    assert out.shape[:2] == (2, 16)

    # embedding-dim mismatch is NOT sliceable — still a loud error
    bad = jax.tree_util.tree_map(np.asarray, ckpt)
    bad["params"]["wte"]["weight"] = bad["params"]["wte"]["weight"][:, :32]
    save_pytree(path, bad)
    with pytest.raises(ValueError, match="shape mismatch"):
        build_model(cfg)


def test_vit_reachable_from_cli(tmp_path):
    """--model vit_b_16 --data synthetic: the model is built at the
    dataset's image size (positional embedding follows the patch grid)."""
    import jax.numpy as jnp
    from curvature_tpu.pipelines.common import build_model
    cfg = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                 model="vit_b_16", data="synthetic", seed=0)
    model, variables = build_model(cfg)
    x = np.zeros((2, 32, 32, 3), np.float32)
    out, _ = model.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (2, 10)
    # 32px / 16 patch -> 2x2 grid + class token
    assert variables["params"]["encoder.pos_embedding"]["value"].shape == \
        (1, 5, 768)


def test_factors_qkv_split_flag(tmp_path):
    """--qkv_split reaches KFAC through the factors pipeline: the packed
    attention in_proj gets [3, E, E] per-chunk G factors."""
    import jax
    from curvature_tpu import models as M
    from curvature_tpu.pipelines.factors import compute_factors
    model = M.tiny_transformer(vocab_free_dim=8, num_heads=2, num_layers=1,
                               num_classes=4)
    rng = jax.random.PRNGKey(0)
    x = np.asarray(jax.random.normal(rng, (4, 5, 8)))
    variables = model.init(rng, x)
    cfg = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                 estimator="kfac", qkv_split=True, mc_samples=1,
                 scan_chunk=1, epochs=1, seed=0)
    est = compute_factors(model, variables,
                          [(x, np.zeros(4, np.int32))], cfg)
    assert est.state["block0.attn/in_proj"]["g"].shape == (3, 8, 8)
