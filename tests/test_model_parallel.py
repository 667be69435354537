"""Model-axis (depth/pp-analogue) and tensor-axis (Megatron column) sharding.

``use_mesh`` auto-detects three canonical mesh axes beyond ``data``:

  * ``model`` — ScanBlocks depth sharding: stacked ``[depth, ...]`` params
    and factor state shard over the axis, so each device owns the blocks,
    factors, eigendecompositions, and posterior draws of its own stage
    (the pipeline-parallel analogue for curvature state).
  * ``tensor`` — column parallelism: wide Dense kernels/biases shard on the
    output-feature dim; KFAC shards the matching [out, out] G-factor rows,
    Diagonal its [out, cols] rows.

Both are pure GSPMD sharding annotations — the factor math is unchanged, so
every sharded run must match the single-device factors exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models, parallel
from curvature_tpu.models.vit import vit

PREFIX = "encoder.layers"


@pytest.fixture(scope="module")
def scan_vit():
    model = vit(image_size=16, patch_size=8, dim=16, depth=4, heads=2,
                mlp_dim=32, num_classes=5, scan_blocks=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 5)
    return model, variables, x, labels


@pytest.fixture(scope="module")
def wide_mlp():
    model = models.mlp([32], 4)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 8))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 0, 4)
    return model, variables, x, labels


def _assert_state_close(sharded, single, keys=("a", "g")):
    for name in single:
        if isinstance(single[name], dict):
            for key in keys:
                if key in single[name]:
                    np.testing.assert_allclose(
                        np.asarray(sharded[name][key]),
                        np.asarray(single[name][key]),
                        rtol=1e-5, atol=1e-6, err_msg=f"{name}/{key}")
        else:
            np.testing.assert_allclose(np.asarray(sharded[name]),
                                       np.asarray(single[name]),
                                       rtol=1e-5, atol=1e-6, err_msg=name)


def test_depth_sharded_scan_kfac_matches_single_device(scan_vit):
    model, variables, x, labels = scan_vit
    ref = estimators.KFAC(model, variables)
    ref.update(x, labels=labels)

    mesh = parallel.make_mesh({"model": 2, "data": 2},
                              devices=jax.devices()[:4])
    sh = estimators.KFAC(model, variables).use_mesh(mesh)
    sh.update(x, labels=labels)
    _assert_state_close(sh.state, ref.state)

    # the stacked factor state actually lives depth-sharded on the mesh
    leaf = sh.state[f"{PREFIX}.mlp.0"]["g"]
    assert leaf.sharding.spec[0] == "model", leaf.sharding
    # non-stacked layers stay replicated
    head = sh.state["heads.head"]["g"]
    assert all(s is None for s in head.sharding.spec)

    # invert + sample propagate the sharding (vmapped over the sharded
    # depth axis -> embarrassingly parallel)
    sh.invert(add=1.0, multiply=10.0)
    ref.invert(add=1.0, multiply=10.0)
    ds = sh.sample(jax.random.PRNGKey(6))
    dr = ref.sample(jax.random.PRNGKey(6))
    for name in dr:
        np.testing.assert_allclose(np.asarray(ds[name]),
                                   np.asarray(dr[name]),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_depth_sharded_efb_carry(scan_vit):
    """EFB's carry (state, diags, eigvecs) all depth-shard for stacked
    layers; factors still match single-device exactly."""
    model, variables, x, labels = scan_vit
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)

    single = estimators.EFB(model, variables, kfac.state)
    single.update(x, labels=labels)

    mesh = parallel.make_mesh({"model": 2, "data": 2},
                              devices=jax.devices()[:4])
    sh = estimators.EFB(model, variables, kfac.state).use_mesh(mesh)
    sh.update(x, labels=labels)

    _assert_state_close(sh.state, single.state)
    _assert_state_close(sh.diags, single.diags)
    lam = sh.state[f"{PREFIX}.mlp.0"]
    assert lam.sharding.spec[0] == "model"
    sh.invert(add=1.0, multiply=10.0)
    s = sh.sample(jax.random.PRNGKey(7))
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in s.values())


def test_tensor_parallel_kfac_matches_single_device(wide_mlp):
    model, variables, x, labels = wide_mlp
    ref = estimators.KFAC(model, variables)
    ref.update(x, labels=labels)

    mesh = parallel.make_mesh({"tensor": 2, "data": 4})
    sh = estimators.KFAC(model, variables).use_mesh(mesh, tensor_min_out=4)
    sh.update(x, labels=labels)
    _assert_state_close(sh.state, ref.state)

    # every eligible layer's G factor is row-sharded over 'tensor'
    for name, leaf in sh.state.items():
        assert leaf["g"].sharding.spec[-2] == "tensor", (name, leaf["g"].sharding)
        # A (input Gram) stays replicated under column parallelism
        assert all(s is None for s in leaf["a"].sharding.spec)

    sh.invert(add=1.0, multiply=10.0)
    ref.invert(add=1.0, multiply=10.0)
    ds = sh.sample(jax.random.PRNGKey(8))
    dr = ref.sample(jax.random.PRNGKey(8))
    for name in dr:
        np.testing.assert_allclose(np.asarray(ds[name]), np.asarray(dr[name]),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_tensor_parallel_diagonal_matches_single_device(wide_mlp):
    model, variables, x, labels = wide_mlp
    ref = estimators.Diagonal(model, variables)
    ref.update(x, labels=labels)

    mesh = parallel.make_mesh({"tensor": 2, "data": 4})
    sh = estimators.Diagonal(model, variables).use_mesh(mesh,
                                                        tensor_min_out=4)
    sh.update(x, labels=labels)
    _assert_state_close(sh.state, ref.state)
    for name, leaf in sh.state.items():
        assert leaf.sharding.spec[-2] == "tensor", (name, leaf.sharding)


def test_combined_model_tensor_data_mesh(scan_vit):
    """All three axes at once (model:2, tensor:2, data:2 on 8 devices):
    depth-sharded stacks whose wide Dense layers are also column-parallel."""
    model, variables, x, labels = scan_vit
    ref = estimators.KFAC(model, variables)
    ref.update(x, labels=labels)

    mesh = parallel.make_mesh({"model": 2, "tensor": 2, "data": 2})
    sh = estimators.KFAC(model, variables).use_mesh(mesh, tensor_min_out=16)
    sh.update(x, labels=labels)
    _assert_state_close(sh.state, ref.state)

    g = sh.state[f"{PREFIX}.mlp.0"]["g"]          # [4, 32, 32] stacked, wide
    assert g.sharding.spec[0] == "model" and g.sharding.spec[1] == "tensor"

    sh.invert(add=1.0, multiply=10.0)
    s = sh.sample(jax.random.PRNGKey(9))
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in s.values())


def test_seq_sharded_lm_factors_match_single_device():
    """Sequence parallelism: the [B, T] token dim shards over 'seq'; factor
    sums are sums over tokens, so per-shard token moments combine exactly.
    [S, B, T] LM labels shard their token dim too."""
    from curvature_tpu.models.gpt import gpt2_custom
    model = gpt2_custom(vocab=32, dim=16, depth=2, heads=2, max_len=8)
    toks = jax.random.randint(jax.random.PRNGKey(0), (4, 8), 0, 32)
    variables = model.init(jax.random.PRNGKey(1), toks)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 4, 8), 0, 32)

    ref = estimators.KFAC(model, variables, loss="lm")
    ref.update(toks, labels=labels)

    mesh = parallel.make_mesh({"seq": 2, "data": 4})
    sh = estimators.KFAC(model, variables, loss="lm").use_mesh(mesh)
    sh.update(toks, labels=labels)
    _assert_state_close(sh.state, ref.state)

    # drawn MC labels take the P(sample, data, seq) hint path
    ref2 = estimators.KFAC(model, variables, loss="lm")
    ref2.update(toks, rng=jax.random.PRNGKey(3), num_samples=2)
    sh2 = estimators.KFAC(model, variables, loss="lm").use_mesh(mesh)
    sh2.update(toks, rng=jax.random.PRNGKey(3), num_samples=2)
    _assert_state_close(sh2.state, ref2.state)

    # odd token counts drop ONLY the seq sharding (data/sample stay live
    # via the noseq wrapper), still correct
    sh3 = estimators.KFAC(model, variables, loss="lm").use_mesh(mesh)
    assert sh3._dispatch("_jit_update", 4, 2, tokens=7) \
        is sh3._jit_update_sharded_noseq
    sh3.update(toks[:, :7], labels=labels[:, :, :7])
    ref3 = estimators.KFAC(model, variables, loss="lm")
    ref3.update(toks[:, :7], labels=labels[:, :, :7])
    _assert_state_close(sh3.state, ref3.state)


def test_seq_sharded_conv_spatial_partitioning():
    """The same 'seq' axis on image inputs shards the leading spatial dim;
    GSPMD inserts the conv halo exchanges, so the patch-extraction Grams
    stay exact."""
    model = models.lenet5(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(5), x)
    labels = jax.random.randint(jax.random.PRNGKey(6), (2, 4), 0, 10)

    ref = estimators.KFAC(model, variables)
    ref.update(x, labels=labels)
    mesh = parallel.make_mesh({"seq": 2, "data": 4})
    sh = estimators.KFAC(model, variables).use_mesh(mesh)
    sh.update(x, labels=labels)
    _assert_state_close(sh.state, ref.state)


def test_explicit_missing_axis_raises(wide_mlp):
    model, variables, _, _ = wide_mlp
    mesh = parallel.make_mesh({"data": 8})
    with pytest.raises(ValueError, match="has no axis"):
        estimators.KFAC(model, variables).use_mesh(mesh, model_axis="model")


def test_unrecognized_mesh_axis_raises(wide_mlp):
    """A typo'd --mesh axis would silently idle chips; use_mesh rejects
    axes no sharding rule uses."""
    model, variables, _, _ = wide_mlp
    mesh = parallel.make_mesh({"modle": 2, "data": 4})
    with pytest.raises(ValueError, match="not used by any sharding rule"):
        estimators.KFAC(model, variables).use_mesh(mesh)
    # explicitly naming the axis makes it legitimate
    est = estimators.KFAC(model, variables).use_mesh(mesh,
                                                     model_axis="modle")
    assert est.mesh is mesh


def test_ensemble_params_from_depth_sharded_state(scan_vit):
    """The vmapped 30-sample-style ensemble draw propagates the depth
    sharding and equals the single-device ensemble exactly."""
    model, variables, x, labels = scan_vit
    mesh = parallel.make_mesh({"model": 2, "data": 2},
                              devices=jax.devices()[:4])
    sh = estimators.KFAC(model, variables).use_mesh(mesh)
    sh.update(x, labels=labels)
    sh.invert(1.0, 10.0)
    ens = sh.ensemble_params(jax.random.PRNGKey(3), 4)

    ref = estimators.KFAC(model, variables)
    ref.update(x, labels=labels)
    ref.invert(1.0, 10.0)
    ens_ref = ref.ensemble_params(jax.random.PRNGKey(3), 4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        ens, ens_ref)


def test_sharded_state_orbax_roundtrip(scan_vit, tmp_path):
    """Depth-sharded factor state checkpoints through orbax and restores
    DIRECTLY into its mesh placement (no host gather / replicated staging)."""
    from curvature_tpu.utils.checkpoint import (load_pytree_orbax,
                                                save_pytree_orbax)
    model, variables, x, labels = scan_vit
    mesh = parallel.make_mesh({"model": 2, "data": 2},
                              devices=jax.devices()[:4])
    est = estimators.KFAC(model, variables).use_mesh(mesh)
    est.update(x, labels=labels)

    path = str(tmp_path / "ckpt")
    save_pytree_orbax(path, est.state)
    shardings = est._carry_shardings(mesh, est._mesh_axes)
    restored = load_pytree_orbax(path, shardings=shardings)
    leaf = restored[f"{PREFIX}.mlp.0"]["g"]
    assert leaf.sharding.spec[0] == "model", leaf.sharding
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        est.state, restored)


def test_update_batches_scan_path_with_model_axis(scan_vit):
    """The lax.scan-folded multi-batch update (donated carry) composes with
    depth-sharded state."""
    model, variables, x, labels = scan_vit
    ref = estimators.KFAC(model, variables)
    ref.update_batches(jnp.stack([x, x + 0.5]), jax.random.PRNGKey(10),
                       num_samples=2)
    mesh = parallel.make_mesh({"model": 2, "data": 2},
                              devices=jax.devices()[:4])
    sh = estimators.KFAC(model, variables).use_mesh(mesh)
    sh.update_batches(jnp.stack([x, x + 0.5]), jax.random.PRNGKey(10),
                      num_samples=2)
    _assert_state_close(sh.state, ref.state)
