"""Multi-chip execution through the pipeline CLIs (VERDICT r2 item 1).

The reference threads ``--parallel`` into every script (reference
utils.py:369, factors.py:86-87, evaluate.py:344-345, hyper.py:60-61); here
``--mesh data:8`` / ``--parallel`` must produce artifacts EQUAL to the
single-device run at 1e-5 — factor accumulation is a sum over the batch, so
mesh sharding is mathematically exact, and the eval/hyper forwards are
deterministic given the seeded ensembles.

Runs on the 8-device virtual CPU mesh from tests/conftest.py.
"""
import dataclasses
import os

import numpy as np
import pytest

from curvature_tpu.utils.config import Config
from curvature_tpu.utils.checkpoint import factors_path, load_pytree
from curvature_tpu.pipelines import factors as factors_pipe
from curvature_tpu.pipelines import evaluate as eval_pipe
from curvature_tpu.pipelines import hyper as hyper_pipe

pytestmark = pytest.mark.slow


def _assert_tree_close(a, b, rtol=1e-5, atol=1e-6, msg=""):
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb), msg
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol, err_msg=msg)


@pytest.fixture(scope="module")
def workspaces(tmp_path_factory):
    """Two identical workspaces, one run single-device and one on the mesh."""
    single_root = str(tmp_path_factory.mktemp("single"))
    mesh_root = str(tmp_path_factory.mktemp("mesh"))

    def cfg(root, **kw):
        return Config(root_dir=root, results_dir=root, model="lenet5",
                      data="synthetic", batch_size=64, epochs=1, samples=4,
                      mc_samples=2, calls=3, rank=20, seed=0, scan_chunk=2,
                      **kw)
    return cfg(single_root), cfg(mesh_root, mesh="data:8")


@pytest.fixture(scope="module")
def factored(workspaces):
    single, mesh = workspaces
    for est in ("diag", "kfac"):
        factors_pipe.run(dataclasses.replace(single, estimator=est))
        factors_pipe.run(dataclasses.replace(mesh, estimator=est))
    # EFB eigendecomposes the KFAC factors: feed both runs the IDENTICAL
    # kfac file so the comparison tests the sharded EFB update itself, not
    # eigh's sensitivity to last-ulp psum reassociation in the kfac inputs
    # (near-degenerate eigvecs rotate freely under 1e-7 input noise).
    import shutil
    kfac_s = factors_path(dataclasses.replace(single, estimator="kfac")) \
        + ".npz"
    kfac_m = factors_path(dataclasses.replace(mesh, estimator="kfac")) \
        + ".npz"
    shutil.copy(kfac_m, kfac_m.replace(".npz", "_meshorig.npz"))
    shutil.copy(kfac_s, kfac_m)
    for cfg in (single, mesh):
        factors_pipe.run(dataclasses.replace(cfg, estimator="efb"))
    return workspaces


def test_factors_cli_mesh_equals_single(factored):
    """diag/kfac/efb factors from the --mesh CLI match single-device —
    including the EFB eigvec-carry scan path under the mesh."""
    single, mesh = factored
    for est in ("diag", "kfac", "efb"):
        s = load_pytree(factors_path(dataclasses.replace(single,
                                                         estimator=est)))
        m_path = factors_path(dataclasses.replace(mesh, estimator=est))
        if est == "kfac":
            m_path += "_meshorig.npz"   # pre-overwrite mesh product
        m = load_pytree(m_path)
        _assert_tree_close(s, m, msg=f"factors mismatch for {est}")


def test_factors_cli_inf_mesh_equals_single(factored):
    """INF assembly (eigh + low-rank build) from mesh-produced inputs."""
    single, mesh = factored
    s_cfg = dataclasses.replace(single, estimator="inf")
    m_cfg = dataclasses.replace(mesh, estimator="inf")
    factors_pipe.run(s_cfg)
    factors_pipe.run(m_cfg)
    s = load_pytree(factors_path(s_cfg, rank="20"))
    m = load_pytree(factors_path(m_cfg, rank="20"))
    # eigh sign freedom: compare the posterior-defining reconstructions,
    # not raw eigvec columns
    for name in s:
        for k in ("lam", "corr"):
            np.testing.assert_allclose(np.asarray(s[name][k]),
                                       np.asarray(m[name][k]),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{name}/{k}")


def test_evaluate_cli_mesh_equals_single(factored):
    single, mesh = factored
    outs = {}
    for cfg in (single, mesh):
        c = dataclasses.replace(cfg, estimator="kfac", ood=True,
                                norm=0.5, scale=10.0, samples=4)
        eval_pipe.run(c)
        from curvature_tpu.utils.checkpoint import results_paths
        path, _ = results_paths(c)
        outs[cfg.root_dir] = np.load(path + ".npz", allow_pickle=True)
    s, m = outs[single.root_dir], outs[mesh.root_dir]
    for key in ("predictions", "bnn_predictions", "ood_predictions",
                "bnn_ood_predictions"):
        np.testing.assert_allclose(s[key], m[key], rtol=1e-5, atol=1e-6,
                                   err_msg=key)


def test_hyper_cli_mesh_equals_single(factored):
    """The batched random-search evaluator under the mesh reproduces the
    single-device costs (same seed -> same candidates and ensembles)."""
    single, mesh = factored
    res = {}
    for cfg in (single, mesh):
        c = dataclasses.replace(cfg, estimator="kfac", optimizer="random",
                                calls=3, samples=3)
        res[cfg.root_dir] = hyper_pipe.run(c)
    s, m = res[single.root_dir], res[mesh.root_dir]
    np.testing.assert_allclose(s["stats"]["cost"], m["stats"]["cost"],
                               rtol=1e-5, atol=1e-6)
    assert s["best_x"] == m["best_x"]


def test_training_and_loss_cli_parallel(tmp_path):
    """--parallel reaches training and loss_landscape too (the last two
    scripts the reference wires DataParallel into, training.py:26-27 and
    loss.py:423-424): sharded training reproduces the single-device loss
    history, and the 1-D landscape artifact matches at 1e-5."""
    from curvature_tpu.pipelines import training as train_pipe
    from curvature_tpu.pipelines import loss_landscape as loss_pipe

    base = Config(root_dir=str(tmp_path / "a"), results_dir=str(tmp_path / "a"),
                  model="lenet5", data="synthetic", batch_size=64,
                  epochs=1, lr=1e-2, seed=0)
    par = dataclasses.replace(base, root_dir=str(tmp_path / "b"),
                              results_dir=str(tmp_path / "b"), parallel=True)
    _, hist_a = train_pipe.run(base)
    _, hist_b = train_pipe.run(par)
    np.testing.assert_allclose(hist_b["loss"], hist_a["loss"], rtol=1e-4)

    la = loss_pipe.run(dataclasses.replace(base, loss1d=True))
    lb = loss_pipe.run(dataclasses.replace(par, loss1d=True))
    np.testing.assert_allclose(lb["train_loss"], la["train_loss"],
                               rtol=1e-4, atol=1e-6)


def test_factors_cli_model_axis_mesh_equals_single(tmp_path):
    """The model (depth-sharding) axis through the PRODUCT path: the
    factors CLI with --mesh model:2,data:4 on a depth-scanned gpt2_tiny
    produces factors equal to the single-device run."""
    import jax

    def cfg(root, **kw):
        return Config(root_dir=root, results_dir=root, model="gpt2_tiny",
                      data="tokens", seq_len=16, batch_size=16, epochs=1,
                      mc_samples=2, seed=0, scan_chunk=2,
                      scan_blocks=True, estimator="kfac", **kw)

    single = cfg(str(tmp_path / "single"))
    meshed = cfg(str(tmp_path / "mesh"), mesh="model:2,data:4")
    factors_pipe.run(single)
    est = factors_pipe.run(meshed)

    # the stacked block factors were actually depth-sharded on the mesh
    stacked = [n for n, m in est.metas.items() if m.stacked]
    assert stacked, "gpt2_tiny scan_blocks should register stacked metas"
    spec = est.state[stacked[0]]["g"].sharding.spec
    assert spec and spec[0] == "model", spec

    a = load_pytree(factors_path(single))
    b = load_pytree(factors_path(meshed))
    _assert_tree_close(a, b, msg="model-axis CLI factors")
