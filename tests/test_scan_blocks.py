"""ScanBlocks (depth-scanned transformer stacks, nn/scan.py): the scanned
model must be *numerically identical* to the unrolled one — same logits,
same curvature factors per depth slice, same posterior machinery — while
compiling one block instead of ``depth`` (the round-3 structural fix for
deep-transformer compile time; benchmarks/NOTES.md round-2 ViT chain needed
--scan_chunk 1 without it)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators
from curvature_tpu.models.vit import vit

DEPTH = 3
PREFIX = "encoder.layers"


def _build_pair():
    kw = dict(image_size=16, patch_size=8, dim=16, depth=DEPTH, heads=2,
              mlp_dim=32, num_classes=5)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    m_scan = vit(**kw, scan_blocks=True)
    v_scan = m_scan.init(rng, x)
    m_un = vit(**kw, scan_blocks=False)
    v_un = m_un.init(rng, x)

    # restack the scan model's params into the unrolled naming so both
    # models compute with identical weights
    info = m_scan.scan_groups[PREFIX]
    p_un = {}
    for layer in info["param_layers"]:
        rest = layer[len(PREFIX):]
        for i, pd in enumerate(info["per_depth_names"]):
            p_un[pd + rest] = {k: v_scan["params"][layer][k][i]
                               for k in v_scan["params"][layer]}
    for k in v_scan["params"]:
        if k not in info["param_layers"]:
            p_un[k] = v_scan["params"][k]
    assert set(p_un) == set(v_un["params"])
    return m_scan, v_scan, m_un, {"params": p_un, "batch_stats": {}}, x


@pytest.fixture(scope="module")
def pair():
    return _build_pair()


def _unrolled_name(stacked_name: str, i: int) -> str:
    return stacked_name.replace(
        f"{PREFIX}.", f"{PREFIX}.encoder_layer_{i}.")


def test_scan_registration(pair):
    m_scan, v_scan, _, _, _ = pair
    stacked = {n: m.stacked for n, m in m_scan.metas.items()}
    assert stacked["conv_proj"] == 0 and stacked["heads.head"] == 0
    for n in (f"{PREFIX}.mlp.0", f"{PREFIX}.mlp.3",
              f"{PREFIX}.self_attention/in_proj",
              f"{PREFIX}.self_attention/out_proj"):
        assert stacked[n] == DEPTH
        assert v_scan["params"][n]["kernel"].shape[0] == DEPTH
    info = m_scan.scan_groups[PREFIX]
    assert info["depth"] == DEPTH
    assert len(info["per_depth_names"]) == DEPTH


def test_logits_match(pair):
    m_scan, v_scan, m_un, v_un, x = pair
    out_s, _ = m_scan.apply(v_scan, x)
    out_u, _ = m_un.apply(v_un, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=1e-5)


def test_kfac_factors_match_and_sample(pair):
    m_scan, v_scan, m_un, v_un, x = pair
    key = jax.random.PRNGKey(3)
    kf_s = estimators.KFAC(m_scan, v_scan)
    kf_s.update(x, rng=key, num_samples=2)
    kf_u = estimators.KFAC(m_un, v_un)
    kf_u.update(x, rng=key, num_samples=2)
    name = f"{PREFIX}.mlp.0"
    for i in range(DEPTH):
        nu = _unrolled_name(name, i)
        np.testing.assert_allclose(np.asarray(kf_s.state[name]["a"][i]),
                                   np.asarray(kf_u.state[nu]["a"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(kf_s.state[name]["g"][i]),
                                   np.asarray(kf_u.state[nu]["g"]),
                                   atol=1e-5)
    kf_s.invert(add=0.1, multiply=1.0)
    sample = kf_s.sample(jax.random.PRNGKey(4))
    meta = m_scan.metas[name]
    assert sample[name].shape == (DEPTH, meta.out_features, meta.mat_cols)
    post = kf_s.posterior_params(jax.random.PRNGKey(5))
    assert post[name]["kernel"].shape == v_scan["params"][name]["kernel"].shape
    # the posterior must actually perturb every depth slice
    delta = np.asarray(post[name]["kernel"] - v_scan["params"][name]["kernel"])
    assert (np.abs(delta).reshape(DEPTH, -1).max(axis=1) > 0).all()


def test_diagonal_matches(pair):
    m_scan, v_scan, m_un, v_un, x = pair
    key = jax.random.PRNGKey(3)
    dg_s = estimators.Diagonal(m_scan, v_scan)
    dg_s.update(x, rng=key, num_samples=2)
    dg_u = estimators.Diagonal(m_un, v_un)
    dg_u.update(x, rng=key, num_samples=2)
    name = f"{PREFIX}.self_attention/in_proj"
    for i in range(DEPTH):
        np.testing.assert_allclose(
            np.asarray(dg_s.state[name][i]),
            np.asarray(dg_u.state[_unrolled_name(name, i)]), atol=1e-5)


@pytest.mark.slow
def test_efb_and_inf_match(pair):
    m_scan, v_scan, m_un, v_un, x = pair
    key = jax.random.PRNGKey(3)
    kf_s = estimators.KFAC(m_scan, v_scan)
    kf_s.update(x, rng=key, num_samples=2)
    kf_u = estimators.KFAC(m_un, v_un)
    kf_u.update(x, rng=key, num_samples=2)
    dg_s = estimators.Diagonal(m_scan, v_scan)
    dg_s.update(x, rng=key, num_samples=2)
    dg_u = estimators.Diagonal(m_un, v_un)
    dg_u.update(x, rng=key, num_samples=2)

    efb_s = estimators.EFB(m_scan, v_scan, kf_s.state)
    efb_s.update(x, rng=key, num_samples=2)
    efb_u = estimators.EFB(m_un, v_un, kf_u.state)
    efb_u.update(x, rng=key, num_samples=2)
    name = f"{PREFIX}.mlp.3"
    for i in range(DEPTH):
        nu = _unrolled_name(name, i)
        # eigenvectors are sign/degeneracy-ambiguous; lambdas are |.|^2 in
        # the eigenbasis, so agreement up to column order is what's exact.
        # ViT factors here are non-degenerate, and jnp.linalg.eigh applied
        # to the identical matrix gives the identical basis -> lambdas match.
        np.testing.assert_allclose(np.asarray(efb_s.state[name][i]),
                                   np.asarray(efb_u.state[nu]),
                                   rtol=1e-4, atol=1e-5)
    efb_s.invert(add=0.1)
    assert efb_s.sample(jax.random.PRNGKey(6))[name].shape[0] == DEPTH

    inf_s = estimators.INF(m_scan, v_scan, dg_s.state, kf_s.state,
                           efb_s.state, eigvecs=efb_s.eigvecs)
    inf_s.update(rank=20)
    inf_u = estimators.INF(m_un, v_un, dg_u.state, kf_u.state,
                           efb_u.state, eigvecs=efb_u.eigvecs)
    inf_u.update(rank=20)
    for i in range(DEPTH):
        nu = _unrolled_name(name, i)
        np.testing.assert_allclose(
            np.asarray(inf_s.state[name]["corr"][i]),
            np.asarray(inf_u.state[nu]["corr"]), rtol=1e-4, atol=1e-5)
    inf_s.invert(add=0.1)
    smp = inf_s.sample(jax.random.PRNGKey(7))
    meta = m_scan.metas[name]
    assert smp[name].shape == (DEPTH, meta.out_features, meta.mat_cols)
    assert np.isfinite(np.asarray(smp[name])).all()


def test_stack_scan_groups_roundtrip(pair):
    """Per-depth (torchvision-style) checkpoint entries fold into the
    stacked layout exactly; already-stacked input passes through."""
    from curvature_tpu.models import stack_scan_groups
    m_scan, v_scan, _, v_un, _ = pair
    restacked = stack_scan_groups(
        {"params": dict(v_un["params"]), "batch_stats": {}}, m_scan)
    for layer in m_scan.scan_groups[PREFIX]["param_layers"]:
        for k in v_scan["params"][layer]:
            np.testing.assert_array_equal(
                np.asarray(restacked["params"][layer][k]),
                np.asarray(v_scan["params"][layer][k]))
        # per-depth names are consumed
        assert _unrolled_name(layer, 0) not in restacked["params"]
    # idempotent on stacked input
    again = stack_scan_groups(restacked, m_scan)
    assert set(again["params"]) == set(restacked["params"])
    # missing depth entries fail loudly
    broken = {"params": {k: v for k, v in v_un["params"].items()
                         if "encoder_layer_1" not in k}, "batch_stats": {}}
    with pytest.raises(ValueError, match="missing per-depth"):
        stack_scan_groups(broken, m_scan)


@pytest.mark.slow
def test_scan_update_under_mesh(pair):
    """Sharded factor update on the scanned model equals single-device."""
    from curvature_tpu.parallel import make_mesh
    m_scan, v_scan, _, _, x = pair
    key = jax.random.PRNGKey(3)
    ref = estimators.KFAC(m_scan, v_scan)
    ref.update(x, rng=key, num_samples=2)
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    sh = estimators.KFAC(m_scan, v_scan).use_mesh(mesh)
    sh.update(x, rng=key, num_samples=2)
    name = f"{PREFIX}.mlp.0"
    np.testing.assert_allclose(np.asarray(sh.state[name]["a"]),
                               np.asarray(ref.state[name]["a"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh.state[name]["g"]),
                               np.asarray(ref.state[name]["g"]),
                               rtol=1e-5, atol=1e-6)


def test_unstack_scan_groups_inverts_stacking():
    """unstack_scan_groups scatters a scan model's stacked [depth, ...]
    variables back to per-depth layers; composing with stack_scan_groups
    round-trips exactly (the export path for depth-scanned checkpoints)."""
    import numpy as np
    from curvature_tpu import models
    from curvature_tpu.models.torch_convert import (
        stack_scan_groups, unstack_scan_groups)

    model = models.build("vit_b_32", num_classes=7, image_size=32,
                         scan_blocks=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    per_depth = unstack_scan_groups(variables, model)
    assert any("encoder_layer_0" in n for n in per_depth["params"])
    assert not any(
        n in per_depth["params"]
        for info in model.scan_groups.values()
        for n in info["param_layers"])
    back = stack_scan_groups(per_depth, model)
    for name, entry in variables["params"].items():
        for k, v in entry.items():
            np.testing.assert_array_equal(np.asarray(back["params"][name][k]),
                                          np.asarray(v), err_msg=f"{name}.{k}")


@pytest.mark.slow
def test_logdet_matches_unrolled(pair):
    """logdet_precision over stacked [depth, ...] factors equals the
    unrolled model's (the marginal likelihood is depth-layout-invariant)."""
    m_scan, v_scan, m_un, v_un, x = pair
    key = jax.random.PRNGKey(3)
    kf_s = estimators.KFAC(m_scan, v_scan)
    kf_s.update(x, rng=key, num_samples=2)
    kf_u = estimators.KFAC(m_un, v_un)
    kf_u.update(x, rng=key, num_samples=2)
    np.testing.assert_allclose(kf_s.logdet_precision(0.3, 2.0),
                               kf_u.logdet_precision(0.3, 2.0), rtol=1e-5)

    d_s = estimators.Diagonal(m_scan, v_scan)
    d_s.update(x, rng=key, num_samples=2)
    d_u = estimators.Diagonal(m_un, v_un)
    d_u.update(x, rng=key, num_samples=2)
    np.testing.assert_allclose(d_s.logdet_precision(0.3, 2.0),
                               d_u.logdet_precision(0.3, 2.0), rtol=1e-5)
