"""Causal-LM pipeline chain through the real CLIs (gpt2_tiny on the
synthetic Markov token stream): factors -> hyper (zero-eval marglik
gradient tuning) -> evaluate --ood with per-token metrics.

The reference has no language models at all (SURVEY.md section 2.3); this
is the LM counterpart of its published factors->hyper->evaluate order
(reference README.rst:226-244).
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

from curvature_tpu.utils.config import Config
from curvature_tpu.utils.checkpoint import factors_path, load_pytree
from curvature_tpu.pipelines import factors as factors_pipe
from curvature_tpu.pipelines import evaluate as eval_pipe
from curvature_tpu.pipelines import hyper as hyper_pipe

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def lm_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lm"))
    cfg = Config(root_dir=root, results_dir=root, model="gpt2_tiny",
                 data="tokens", seq_len=16, batch_size=32, epochs=1,
                 samples=3, mc_samples=2, rank=16, seed=0)
    for est in ("diag", "kfac", "efb", "inf"):
        factors_pipe.run(dataclasses.replace(cfg, estimator=est))
    return cfg


def test_lm_factors_artifacts(lm_root):
    cfg = lm_root
    for est in ("diag", "kfac", "efb"):
        state = load_pytree(factors_path(
            dataclasses.replace(cfg, estimator=est)))
        assert "lm_head" in state and "h.0.attn.c_attn" in state
        # per-layer state is a dict for kfac/efb, a flat array for diag
        import jax
        for leaf in jax.tree_util.tree_leaves(state["lm_head"]):
            assert np.all(np.isfinite(np.asarray(leaf)))


def test_lm_marglik_gradient_tuning(lm_root):
    cfg = dataclasses.replace(lm_root, estimator="kfac", optimizer="grad",
                              objective="marglik", calls=4)
    hyper_pipe.run(cfg)
    best = glob.glob(os.path.join(cfg.results_dir, "**", "*best_params*"),
                     recursive=True)
    assert best, "hyper must save best params"
    vals = np.load(best[0])
    assert np.all(np.isfinite(vals))


def test_lm_evaluate_ood_per_token(lm_root, capsys):
    cfg = dataclasses.replace(lm_root, estimator="kfac", ood=True,
                              norm=1.0, scale=1.0, samples=3)
    eval_pipe.run(cfg)
    # OOD artifact layout: <results>/<model>/data/<est>/<model>_<data>.npz
    # (reference evaluate.py:254-261 layout, keys hold the predictions)
    files = glob.glob(os.path.join(cfg.results_dir, "**", "*.npz"),
                      recursive=True)
    preds = [f for f in files
             if os.sep + os.path.join("data", "kfac") + os.sep in f]
    assert preds, f"no prediction artifacts in {files}"
    data = np.load(preds[0])
    key = [k for k in data.files if "predictions" in k][0]
    p = data[key]
    # per-token flattening: N = num_sequences * seq_len, K = vocab
    assert p.ndim == 2 and p.shape[0] == 256 * cfg.seq_len
    assert p.shape[1] == 256  # byte vocab
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)
