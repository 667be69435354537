"""utils layer tests: config CLI, artifact paths, telemetry."""
import os

import numpy as np
import pytest

from curvature_tpu.utils.config import Config, parse_args
from curvature_tpu.utils.checkpoint import factors_path, results_paths
from curvature_tpu.utils.monitor import Timer, ram, seed_all_rng


def test_parse_args_flag_surface():
    cfg = parse_args([
        "--model", "resnet18", "--data", "cifar10", "--estimator", "efb",
        "--batch_size", "64", "--samples", "10", "--mc_samples", "5",
        "--norm", "2.5", "--scale", "1000", "--rank", "50",
        "--pre_scale", "50000", "--ood", "--verbose",
    ])
    assert cfg.model == "resnet18" and cfg.data == "cifar10"
    assert cfg.estimator == "efb" and cfg.batch_size == 64
    assert cfg.samples == 10 and cfg.mc_samples == 5
    assert cfg.norm == 2.5 and cfg.scale == 1000.0
    assert cfg.rank == 50 and cfg.pre_scale == 50000
    assert cfg.ood is True and cfg.verbose is True
    assert cfg.fgsm is False           # untouched toggles stay off
    assert cfg.data_dir.endswith("datasets")


def test_artifact_paths_match_reference_layout(tmp_path):
    cfg = Config(root_dir=str(tmp_path), results_dir=str(tmp_path),
                 model="resnet18", data="cifar10", estimator="kfac",
                 prefix="p_", suffix="_s")
    fp = factors_path(cfg)
    assert fp.endswith("factors/p_resnet18_cifar10_kfac_s")
    fp_rank = factors_path(cfg, "inf", rank="100")
    assert fp_rank.endswith("factors/p_resnet18_cifar10_inf_s100")
    results, figs = results_paths(cfg)
    assert "resnet18/data/kfac" in results.replace(os.sep, "/")
    assert "resnet18/figures/kfac" in figs.replace(os.sep, "/")
    assert os.path.isdir(os.path.dirname(results))


def test_timer_accumulates():
    t = Timer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b"):
        pass
    assert t.times["a"] > 0 and "b" in t.times


def test_monitor_basics():
    assert 0 < ram() <= 100
    s1 = seed_all_rng(123)
    a = np.random.rand(3)
    seed_all_rng(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert s1 == 123
    auto = seed_all_rng(None)
    assert isinstance(auto, int)


def test_save_pytree_rejects_separator_keys(tmp_path):
    """Keys containing the '::' flatten separator must fail loudly instead
    of silently scrambling the round-trip (ADVICE r1)."""
    import pytest
    from curvature_tpu.utils.checkpoint import save_pytree
    with pytest.raises(ValueError, match="separator"):
        save_pytree(str(tmp_path / "x.npz"), {"bad::name": {"a": [1.0]}})


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend for very large factor states (per-array files instead
    of one in-RAM zip) round-trips the same nested pytrees as the npz path."""
    import numpy as np
    from curvature_tpu.utils.checkpoint import (load_pytree_orbax,
                                                save_pytree_orbax)
    tree = {"conv1": {"a": np.arange(6.0).reshape(2, 3),
                      "g": np.ones((4, 4), np.float32)},
            "fc": {"d": np.full((5,), 2.5)}}
    path = str(tmp_path / "factors_orbax")
    save_pytree_orbax(path, tree)
    out = load_pytree_orbax(path)
    assert set(out) == {"conv1", "fc"}
    np.testing.assert_allclose(out["conv1"]["a"], tree["conv1"]["a"])
    np.testing.assert_allclose(out["fc"]["d"], tree["fc"]["d"])
