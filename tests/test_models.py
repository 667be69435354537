"""Model zoo tests: shapes, torch weight conversion parity, attention
curvature support (which the reference lacks for KFAC/EFB/INF)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.models.lenet5 import TORCH_KEY_MAP
from curvature_tpu.models.torch_convert import convert_torch_state_dict


def test_lenet5_bundled_checkpoint_parity():
    """Our LeNet-5 with the converted bundled reference checkpoint must
    reproduce the torch model's logits (BASELINE pretrained parity)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from curvature.lenet5 import lenet5 as torch_lenet5

    tmodel = torch_lenet5(pretrained="", device="cpu")
    state = torch.load("/root/reference/curvature/lenet5_mnist.pth",
                       map_location="cpu")
    tmodel.load_state_dict(state)
    tmodel.eval()
    variables = convert_torch_state_dict(tmodel.state_dict(), TORCH_KEY_MAP)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    variables.setdefault("batch_stats", {})

    model = models.lenet5()
    model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))

    rng = np.random.default_rng(0)
    x = rng.random((4, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x)).numpy()
    jout, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-4, atol=1e-4)


def test_resnet18_shapes_and_bn_modes():
    model = models.resnet18(num_classes=10, stem="cifar")
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out_eval, aux_eval = model.apply(variables, x, train=False)
    assert out_eval.shape == (2, 10)
    assert not aux_eval["batch_stats"]
    out_train, aux_train = model.apply(variables, x, train=True)
    assert aux_train["batch_stats"], "train mode must update running stats"
    # 20 tracked convs + fc
    assert sum(m.kind == "conv" for m in model.metas.values()) == 20
    assert "fc" in model.metas


@pytest.mark.slow
def test_densenet121_builds():
    model = models.densenet121(num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)
    # 120 tracked convs + classifier
    assert len(model.metas) == 121


def test_attention_all_estimators():
    """KFAC/EFB/INF work on attention projections — the reference raises
    NotImplementedError there (curvatures.py:303-304, 351-352, 435-436)."""
    model = models.tiny_transformer(vocab_free_dim=8, num_heads=2,
                                    num_layers=1, num_classes=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 5, 8))
    variables = model.init(rng, x)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 4)
    assert "block0.attn/in_proj" in model.metas
    assert "block0.attn/out_proj" in model.metas

    diag = estimators.Diagonal(model, variables)
    diag.update(x, labels=labels)
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, labels=labels)
    assert "block0.attn/in_proj" in kfac.state
    kfac.invert(add=1.0, multiply=1.0)
    sample = kfac.sample(jax.random.PRNGKey(2))
    assert sample["block0.attn/in_proj"].shape == (24, 9)

    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, labels=labels)
    inf = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    inf.update(rank=10)
    inf.invert(add=10.0, multiply=10.0)
    s = inf.sample(jax.random.PRNGKey(3))
    assert all(bool(jnp.isfinite(v).all()) for v in s.values())

    # posterior params still run through the model
    p = kfac.posterior_params(jax.random.PRNGKey(4))
    out, _ = model.apply({"params": p, "batch_stats": {}}, x)
    assert bool(jnp.isfinite(out).all())


def test_layer_types_filter():
    model = models.lenet5()
    x = jnp.zeros((1, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    conv_only = estimators.Diagonal(model, variables, layer_types="Conv2d")
    assert set(conv_only.metas) == {"conv1", "conv2"}
    lin_only = estimators.Diagonal(model, variables, layer_types=["Linear"])
    assert set(lin_only.metas) == {"fc1", "fc2", "fc3"}


def test_vgg_builds_and_converts_shapes():
    model = models.vgg("vgg11", num_classes=10)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)
    # 8 convs + 3 classifier denses tracked
    assert sum(m.kind == "conv" for m in model.metas.values()) == 8
    assert sum(m.kind == "dense" for m in model.metas.values()) == 3
    # torchvision-style names for conversion
    assert "features.0" in model.metas and "classifier.6" in model.metas


def test_transformer_encoder_full_curvature():
    model = models.transformer_encoder(vocab=50, dim=16, heads=2, depth=2,
                                       max_len=12, num_classes=5)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (4, 12), 0, 50)
    variables = model.init(jax.random.PRNGKey(1), tokens)
    out, _ = model.apply(variables, tokens, train=False)
    assert out.shape == (4, 5)
    # every attention + MLP projection tracked
    assert "block0.attn/in_proj" in model.metas
    assert "block1.mlp.fc2" in model.metas

    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 0, 5)
    kfac = estimators.KFAC(model, variables)
    kfac.update(tokens, labels=labels)
    kfac.invert(add=1.0, multiply=1.0)
    p = kfac.posterior_params(jax.random.PRNGKey(3))
    out2, _ = model.apply({"params": p, "batch_stats": {}}, tokens)
    assert bool(jnp.isfinite(out2).all())


@pytest.mark.slow
def test_googlenet_builds():
    model = models.googlenet(num_classes=10)
    x = jnp.zeros((1, 96, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)
    assert "inception3a.branch2.1.conv" in model.metas
    assert len(model.metas) == 58  # 57 convs + fc


def _roundtrip(tmodel, our_model, x_nchw, rtol=2e-3, atol=2e-4):
    """torch model (torchvision-naming replica) -> convert state dict ->
    logit parity in eval mode.

    Proves naming + layout (OIHW->HWIO, channel-major flatten, BN stats)
    line up for the zoo the reference drives via pretrained torchvision
    weights (reference factors.py:80-84). Random init stands in for
    pretrained weights in this download-free environment: parity is a
    property of the conversion, not of the weight values.
    """
    tmodel.eval()
    variables = convert_torch_state_dict(tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    variables.setdefault("batch_stats", {})

    h, w = x_nchw.shape[2], x_nchw.shape[3]
    our_model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x_nchw)).numpy()
    jout, _ = our_model.apply(variables, jnp.asarray(
        x_nchw.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=rtol, atol=atol)


def _img(seed, size):
    return np.random.default_rng(seed).random((2, 3, size, size)).astype(
        np.float32)


def test_resnet50_reference_roundtrip():
    """resnet50 (CIFAR stem) vs the reference's vendored torch ResNet
    (reference curvature/resnet.py:64-200)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from curvature.resnet import Bottleneck, ResNet

    tmodel = ResNet(Bottleneck, [3, 4, 6, 3], num_classes=10)
    _roundtrip(tmodel, models.resnet50(num_classes=10, stem="cifar"),
               _img(1, 64))


@pytest.mark.slow
def test_densenet121_roundtrip():
    from tests.torch_zoo import TorchDenseNet
    _roundtrip(TorchDenseNet("densenet121", num_classes=10),
               models.densenet121(num_classes=10), _img(2, 64))


@pytest.mark.slow
def test_vgg11_roundtrip():
    from tests.torch_zoo import TorchVGG
    _roundtrip(TorchVGG("vgg11", num_classes=10),
               models.vgg11(num_classes=10), _img(3, 224))


@pytest.mark.slow
def test_vgg11_bn_roundtrip():
    from tests.torch_zoo import TorchVGG
    _roundtrip(TorchVGG("vgg11", num_classes=10, batch_norm=True),
               models.vgg11(num_classes=10, batch_norm=True), _img(4, 224))


@pytest.mark.slow
def test_googlenet_roundtrip():
    from tests.torch_zoo import TorchGoogLeNet
    _roundtrip(TorchGoogLeNet(num_classes=10),
               models.googlenet(num_classes=10), _img(5, 96))


@pytest.mark.slow
def test_inception_v3_roundtrip():
    """Inception v3 (the reference's 299-px model, aux-free): torchvision
    naming converts, logits match the torch replica."""
    from tests.torch_zoo import TorchInceptionV3
    _roundtrip(TorchInceptionV3(num_classes=10),
               models.inception_v3(num_classes=10), _img(2, 299))
    model = models.inception_v3(num_classes=10)
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "Mixed_5b.branch5x5_2.conv" in model.metas
    assert "Mixed_6b.branch7x7_2.conv" in model.metas   # (1,7) conv tracked
    # 94 convs + fc
    assert sum(m.kind == "conv" for m in model.metas.values()) == 94


@pytest.mark.slow
def test_resnext50_reference_roundtrip():
    """resnext50_32x4d: the grouped-bottleneck widths and per-group conv2
    convert against the reference's vendored torch ResNet with
    groups=32/width_per_group=4 (reference resnet.py:67-76, 108-126)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from curvature.resnet import Bottleneck, ResNet

    tmodel = ResNet(Bottleneck, [3, 4, 6, 3], num_classes=10,
                    groups=32, width_per_group=4)
    _roundtrip(tmodel,
               models.build("resnext50_32x4d", num_classes=10, stem="cifar"),
               _img(4, 64))


@pytest.mark.slow
def test_wide_resnet50_reference_roundtrip():
    """wide_resnet50_2 (width_per_group=128, no grouping) against the
    reference's vendored torch ResNet."""
    import sys
    sys.path.insert(0, "/root/reference")
    from curvature.resnet import Bottleneck, ResNet

    tmodel = ResNet(Bottleneck, [3, 4, 6, 3], num_classes=10,
                    width_per_group=128)
    _roundtrip(tmodel,
               models.build("wide_resnet50_2", num_classes=10, stem="cifar"),
               _img(5, 64))


@pytest.mark.slow
def test_mobilenet_v2_roundtrip_and_curvature():
    """mobilenet_v2: depthwise ConvBNReLU6 stacks convert with torchvision
    naming, and KFAC runs over every depthwise conv through the per-group
    block factors — the reference's KFAC cannot run grouped convs at all
    (curvatures.py:328-335 would shape-mismatch at sampling)."""
    from tests.torch_zoo import TorchMobileNetV2

    our = models.build("mobilenet_v2", num_classes=10)
    _roundtrip(TorchMobileNetV2(num_classes=10), our, _img(6, 64))

    # 52 convs (1 stem + 17 blocks x 3 - 1 no-expand + 1 head) + classifier
    metas = our.metas
    assert sum(m.kind == "conv" for m in metas.values()) == 52
    dw = [m for m in metas.values() if m.kind == "conv" and m.groups > 1]
    assert len(dw) == 17                       # one depthwise per block
    assert all(m.fan_in == 9 for m in dw)      # C/groups * 3 * 3 == 9

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    est = estimators.KFAC(our, variables)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    name = "features.1.conv.0.0"               # depthwise, groups=32
    assert est.state[name]["a"].shape == (32, 9, 9)
    assert est.state[name]["g"].shape == (32, 1, 1)
    est.invert(add=1.0, multiply=10.0)
    sample = est.sample(jax.random.PRNGKey(3))
    assert sample[name].shape == (32, 9)
    assert bool(jnp.isfinite(sample[name]).all())


@pytest.mark.slow
def test_efficientnet_b0_roundtrip_and_curvature():
    """efficientnet_b0: MBConv depthwise stacks + squeeze-excitation gates
    convert with torchvision naming; the SE fc1/fc2 1x1 convs are tracked
    layers, so KFAC covers the full parameter set (the reference's KFAC
    cannot run any EfficientNet — grouped convs shape-mismatch its unfold
    A, curvatures.py:328-335)."""
    from tests.torch_zoo import TorchEfficientNet

    our = models.build("efficientnet_b0", num_classes=10)
    _roundtrip(TorchEfficientNet(num_classes=10), our, _img(7, 64))

    metas = our.metas
    dw = [m for m in metas.values() if m.kind == "conv" and m.groups > 1]
    assert len(dw) == 16                       # one depthwise per MBConv
    se = [n for n in metas if n.endswith(".fc1") or n.endswith(".fc2")]
    assert len(se) == 32                       # fc1+fc2 per block
    # batch >= 8: with a 1-2 image batch the last-stage BatchNorms (1x1
    # spatial) see near-zero variance and 1/std amplifies the probe grads
    # to ~1e18 — a degenerate-statistics artifact, not an estimator
    # property (the reference's train-mode capture has the same behavior)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 64, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    est = estimators.KFAC(our, variables)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    name = "features.1.0.block.0.0"            # depthwise, groups=32
    assert est.state[name]["a"].shape == (32, 9, 9)
    se_name = "features.1.0.block.1.fc1"       # SE squeeze conv (bias)
    assert est.state[se_name]["a"].shape == (33, 33)
    est.invert(add=1.0, multiply=10.0)
    sample = est.sample(jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(sample[name]).all())
    assert bool(jnp.isfinite(sample[se_name]).all())


@pytest.mark.slow
def test_efficientnet_b1_depth_scaling_roundtrip():
    """efficientnet_b1 (depth_mult 1.1): the compound depth scaling
    (ceil(n * d) blocks per stage) matches the torch replica's."""
    from tests.torch_zoo import TorchEfficientNet

    _roundtrip(TorchEfficientNet(num_classes=10, depth_mult=1.1),
               models.build("efficientnet_b1", num_classes=10), _img(8, 64))


@pytest.mark.slow
def test_mobilenet_v3_roundtrips():
    """mobilenet_v3_large/small: hardswish/ReLU block mix, hardsigmoid SE
    gates, and the two-linear classifier convert with torchvision naming."""
    from tests.torch_zoo import TorchMobileNetV3
    from curvature_tpu.models.mobilenet import _V3_LARGE, _V3_SMALL

    _roundtrip(TorchMobileNetV3(_V3_LARGE, 1280, num_classes=10),
               models.build("mobilenet_v3_large", num_classes=10),
               _img(9, 64))
    _roundtrip(TorchMobileNetV3(_V3_SMALL, 1024, num_classes=10),
               models.build("mobilenet_v3_small", num_classes=10),
               _img(10, 64))
    our = models.build("mobilenet_v3_small", num_classes=10)
    our.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert "classifier.0" in our.metas and "classifier.3" in our.metas


@pytest.mark.slow
def test_shufflenet_v2_roundtrip_and_curvature():
    """shufflenet_v2_x1_0: channel split/shuffle topology and the
    depthwise branches convert with torchvision naming; KFAC runs the
    depthwise convs through per-group block factors."""
    from tests.torch_zoo import TorchShuffleNetV2

    our = models.build("shufflenet_v2_x1_0", num_classes=10)
    _roundtrip(TorchShuffleNetV2(num_classes=10), our, _img(11, 64))

    dw = [m for m in our.metas.values()
          if m.kind == "conv" and m.groups > 1]
    assert len(dw) == 19                  # 16 stride-1 + 3x2 stride-2...
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 64, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    est = estimators.KFAC(our, variables)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    name = "stage2.0.branch1.0"           # stride-2 depthwise, groups=24
    assert est.state[name]["a"].shape == (24, 9, 9)
    est.invert(add=1.0, multiply=10.0)
    assert bool(jnp.isfinite(est.sample(jax.random.PRNGKey(3))[name]).all())


@pytest.mark.slow
def test_squeezenet_roundtrips():
    """squeezenet1_1 (+1_0 ceil-mode pooling): Fire modules and the 1x1
    conv classifier convert with torchvision naming. 77px input makes the
    first maxpool hit the ceil_mode path (38 -> 19 vs floor's 18)."""
    from tests.torch_zoo import TorchSqueezeNet

    our = models.build("squeezenet1_1", num_classes=10)
    _roundtrip(TorchSqueezeNet("1_1", num_classes=10), our, _img(12, 77))
    assert our.metas["classifier.1"].kind == "conv"
    _roundtrip(TorchSqueezeNet("1_0", num_classes=10),
               models.build("squeezenet1_0", num_classes=10), _img(13, 77))


@pytest.mark.slow
def test_convnext_tiny_roundtrip_and_curvature():
    """convnext_tiny: patchify stem, LayerNorm2d (last-axis LN in NHWC),
    depthwise-7x7 blocks, channels-last MLP Linears, and the raw
    layer_scale parameter all convert with torchvision naming; KFAC
    covers the depthwise convs (per-group factors, 50x50 per channel)
    and the MLP Linears ([N*H*W, C] token activations)."""
    from tests.torch_zoo import TorchConvNeXt

    our = models.build("convnext_tiny", num_classes=10)
    _roundtrip(TorchConvNeXt(num_classes=10), our, _img(14, 64))

    metas = our.metas
    dw = [m for m in metas.values() if m.kind == "conv" and m.groups > 1]
    assert len(dw) == 18                        # one 7x7 per CNBlock
    assert all(m.fan_in == 49 for m in dw)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    assert "features.1.0.layer_scale" in variables["params"]
    est = estimators.KFAC(our, variables)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    name = "features.1.0.block.0"               # depthwise 7x7, groups=96
    assert est.state[name]["a"].shape == (96, 50, 50)
    mlp = "features.1.0.block.3"                # Linear on NHWC tokens
    assert est.state[mlp]["a"].shape == (97, 97)
    est.invert(add=1.0, multiply=10.0)
    s = est.sample(jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(s[name]).all())
    assert bool(jnp.isfinite(s[mlp]).all())


@pytest.mark.slow
def test_regnet_roundtrips_and_curvature():
    """regnet_y_400mf (SE) and regnet_x_400mf: the quantized log-space
    width generator must match torchvision's (block_params), and the
    grouped bottleneck 3x3s run per-group KFAC factors."""
    from curvature_tpu.models.regnet import block_params
    from tests.torch_zoo import TorchRegNet

    # torchvision's regnet_y_400mf resolves to these stage params
    widths, depths, gws = block_params(16, 48, 27.89, 2.09, 8)
    assert sum(depths) == 16 and len(widths) == len(depths) == len(gws)

    our = models.build("regnet_y_400mf", num_classes=10)
    _roundtrip(TorchRegNet(widths, depths, gws, 0.25, num_classes=10),
               our, _img(15, 64))
    dw = [m for m in our.metas.values()
          if m.kind == "conv" and m.groups > 1]
    assert len(dw) == 16                      # one grouped 3x3 per block
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 64, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    est = estimators.KFAC(our, variables)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    name = "trunk_output.block1.block1-0.f.b.0"
    g = our.metas[name].groups
    assert est.state[name]["a"].shape == (g, 72, 72)  # 8ch*3*3, bias-free
    est.invert(add=1.0, multiply=10.0)
    assert bool(jnp.isfinite(est.sample(jax.random.PRNGKey(3))[name]).all())

    xw, xd, xg = block_params(22, 24, 24.48, 2.54, 16)
    _roundtrip(TorchRegNet(xw, xd, xg, 0.0, num_classes=10),
               models.build("regnet_x_400mf", num_classes=10), _img(16, 64))


@pytest.mark.slow
def test_alexnet_roundtrip():
    """alexnet: adaptive 6x6 pooling + channel-major flatten convert; the
    96px input makes the adaptive pool actually resample (11x11 -> 6x6)."""
    from tests.torch_zoo import TorchAlexNet

    _roundtrip(TorchAlexNet(num_classes=10),
               models.build("alexnet", num_classes=10), _img(17, 96))


@pytest.mark.slow
def test_efficientnet_v2_s_roundtrip():
    """efficientnet_v2_s: FusedMBConv early stages (dense kxk expand),
    eps=1e-3 BatchNorms, and the explicit stage table convert with
    torchvision naming."""
    from tests.torch_zoo import TorchEfficientNetV2

    our = models.build("efficientnet_v2_s", num_classes=10)
    _roundtrip(TorchEfficientNetV2(num_classes=10), our, _img(20, 64))
    # fused stage 1 (t=1): single dense 3x3 CNA at block.0
    assert our.metas["features.1.0.block.0.0"].groups == 1
    # MBConv stage 4: depthwise at block.1 after the 1x1 expand
    assert our.metas["features.4.0.block.1.0"].groups > 1


@pytest.mark.slow
def test_swin_t_roundtrip_and_curvature():
    """swin_t: patch embed, shifted-window attention (cyclic shift +
    boundary mask + relative-position bias via the converted index
    buffer), patch merging, and the window qkv/proj tracked Dense layers
    all convert with torchvision naming. 56px -> 14x14 feature grid pads
    to 14 (two 7x7 windows per dim) and the odd blocks' shift=3 engages
    the mask path. The reference cannot track ANY attention parameters
    with KFAC/EFB/INF (curvatures.py:303-304)."""
    from tests.torch_zoo import TorchSwin

    our = models.build("swin_t", num_classes=10)
    _roundtrip(TorchSwin(num_classes=10), our, _img(21, 56))

    assert "features.1.0.attn.qkv" in our.metas
    assert "features.2.reduction" in our.metas
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    assert "features.1.0.attn.relative_position_index" \
        in variables["params"]
    est = estimators.KFAC(our, variables)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    name = "features.1.0.attn.qkv"
    assert est.state[name]["a"].shape == (97, 97)      # dim 96 + bias col
    assert est.state[name]["g"].shape == (288, 288)    # 3*dim
    est.invert(add=1.0, multiply=10.0)
    assert bool(jnp.isfinite(est.sample(jax.random.PRNGKey(3))[name]).all())


@pytest.mark.slow
def test_swin_v2_t_roundtrip():
    """swin_v2_t: cosine attention with clamped logit_scale, continuous
    position bias through the cpb_mlp (tracked Dense layers), k-bias
    zeroing, res-post-norm blocks, and PatchMergingV2's reduce-then-norm
    order all convert with torchvision naming. 48px -> 12x12 grid pads
    to 16 with window 8 and shift 4."""
    from tests.torch_zoo import TorchSwinV2

    our = models.build("swin_v2_t", num_classes=10)
    _roundtrip(TorchSwinV2(num_classes=10), our, _img(22, 48))
    assert "features.1.0.attn.cpb_mlp.0" in our.metas
    x = jnp.zeros((1, 48, 48, 3))
    variables = our.init(jax.random.PRNGKey(0), x)
    assert "features.1.0.attn.logit_scale" in variables["params"]
    assert "features.1.0.attn.relative_coords_table" in variables["params"]


@pytest.mark.slow
def test_mnasnet_roundtrip():
    """mnasnet1_0 (+0_5 width scaling): the flat ``layers`` Sequential
    naming and depthwise stacks convert with torchvision naming."""
    from tests.torch_zoo import TorchMNASNet

    our = models.build("mnasnet1_0", num_classes=10)
    _roundtrip(TorchMNASNet(1.0, num_classes=10), our, _img(18, 64))
    assert "layers.8.0.layers.3" in our.metas          # depthwise in stack
    assert our.metas["layers.3"].groups == 32          # stem depthwise
    _roundtrip(TorchMNASNet(0.5, num_classes=10),
               models.build("mnasnet0_5", num_classes=10), _img(19, 64))


@pytest.mark.slow
def test_vit_large_registry_builds():
    """vit_l_16/vit_h_14 resolve from the registry with the torchvision
    dimensions (24x1024 / 32x1280); tiny image keeps the build cheap."""
    m = models.build("vit_l_16", num_classes=7, image_size=32)
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(variables, x)
    assert out.shape == (1, 7)
    blocks = {n for n in m.metas if "encoder_layer_23" in n}
    assert blocks                                       # 24 layers deep
    name = "encoder.layers.encoder_layer_0.self_attention/in_proj"
    assert m.metas[name].heads == 16


@pytest.mark.slow
def test_vit_roundtrip_and_curvature():
    """ViT: torchvision-named checkpoint converts (packed in_proj_weight,
    LayerNorm 1-D weights, raw class_token/pos_embedding tensors) with
    logit parity, and KFAC runs over every projection — the reference
    raises NotImplementedError on attention (curvatures.py:303-304)."""
    from tests.torch_zoo import TorchViT
    from curvature_tpu.models.vit import vit

    our = vit(image_size=32, patch_size=8, dim=64, depth=2, heads=2,
              mlp_dim=128, num_classes=10)
    _roundtrip(TorchViT(image_size=32, patch_size=8, dim=64, depth=2,
                        heads=2, mlp_dim=128, num_classes=10),
               our, _img(3, 32), rtol=5e-3, atol=5e-4)

    # every projection tracked: conv_proj, 2x(in/out_proj + 2 mlp), head
    assert "conv_proj" in our.metas
    assert "encoder.layers.encoder_layer_0.self_attention/in_proj" in our.metas
    assert "encoder.layers.encoder_layer_1.mlp.3" in our.metas
    assert len(our.metas) == 2 + 2 * 4

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    est = estimators.KFAC(our, variables, attention_qkv_split=True)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=2)
    est.invert(add=1.0, multiply=10.0)
    params = est.posterior_params(jax.random.PRNGKey(3))
    logits, _ = our.apply({"params": params, "batch_stats": {}}, x,
                          train=False)
    assert bool(jnp.isfinite(logits).all())


def test_vit_b16_registry_build():
    model = models.build("vit_b_16", num_classes=10)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)
    # 12 blocks x 4 projections + conv_proj + head
    assert len(model.metas) == 12 * 4 + 2


def test_convert_loud_failures_and_shape_check():
    """Converter failure modes are loud: bias-free LayerNorm/attention and
    unpacked q/k/v projections raise with the layer name; a checkpoint
    whose shapes mismatch the built model raises at load, not deep in
    apply."""
    import numpy as np
    from curvature_tpu.models.torch_convert import convert_torch_state_dict

    with pytest.raises(ValueError, match="bias-free LayerNorm"):
        convert_torch_state_dict({"ln.weight": np.ones(4, np.float32)})
    with pytest.raises(ValueError, match="bias-free MultiheadAttention"):
        convert_torch_state_dict(
            {"attn.in_proj_weight": np.ones((12, 4), np.float32)})
    with pytest.raises(ValueError, match="unpacked attention"):
        convert_torch_state_dict(
            {"attn.q_proj_weight": np.ones((4, 4), np.float32)})

    # shape validation on checkpoint load (a 224-px ViT pos embedding
    # against a 32-px build would otherwise crash inside apply)
    import dataclasses
    from curvature_tpu.utils.config import Config
    from curvature_tpu.utils.checkpoint import save_pytree
    from curvature_tpu.pipelines.common import build_model
    import tempfile, os
    with tempfile.TemporaryDirectory() as root:
        cfg = Config(root_dir=root, results_dir=root, model="lenet5",
                     data="synthetic", seed=0)
        os.makedirs(os.path.join(root, "weights"))
        save_pytree(os.path.join(root, "weights", "lenet5_synthetic.npz"),
                    {"params": {"fc3": {"kernel": np.zeros((84, 7),
                                                           np.float32)}}})
        with pytest.raises(ValueError, match="shape mismatch for fc3"):
            build_model(cfg)


@pytest.mark.slow
def test_maxvit_roundtrip_and_curvature():
    """maxvit_t-architecture (scaled down): MBConv with avg-pool shortcut
    and output-derived expand/squeeze widths, window AND grid relative-
    position attention (feat_dim**-0.5 key scaling, converted index
    buffer), and the LN/Linear/tanh/bias-free-Linear classifier all
    convert with torchvision naming. 32px with partition 2 exercises
    window p=2 and grid p in {8, 4} (the axis-swap path). The reference
    cannot run this model at all (attention NotImplementedError,
    curvatures.py:303-304; depthwise unfold mismatch, :328-335)."""
    from tests.torch_zoo import TorchMaxVit
    from curvature_tpu.models.maxvit import maxvit

    our = maxvit(stem_channels=8, block_channels=(8, 16),
                 block_layers=(1, 1), head_dim=4, partition=2,
                 num_classes=10)
    _roundtrip(TorchMaxVit(stem=8, channels=(8, 16), layers=(1, 1),
                           head_dim=4, partition=2, input_size=32,
                           num_classes=10),
               our, _img(23, 32))

    qkv = "blocks.0.layers.0.layers.window_attention.attn_layer.1.to_qkv"
    assert qkv in our.metas
    assert our.metas["blocks.0.layers.0.layers.MBconv.layers.conv_b.0"] \
        .groups == 32                                   # depthwise expand
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = our.init(jax.random.PRNGKey(1), x)
    est = estimators.KFAC(our, variables)
    est.update(x, rng=jax.random.PRNGKey(2), num_samples=1)
    assert est.state[qkv]["a"].shape == (9, 9)           # dim 8 + bias col
    assert est.state[qkv]["g"].shape == (24, 24)         # 3*dim
    est.invert(add=1.0, multiply=10.0)
    assert bool(jnp.isfinite(est.sample(jax.random.PRNGKey(3))[qkv]).all())


def test_maxvit_t_registry_builds():
    """maxvit_t resolves from the registry with the torchvision config
    (stem 64, channels 64..512, depths 2/2/5/2, partition 7, 224px)."""
    m = models.build("maxvit_t", num_classes=10)
    from curvature_tpu.models.maxvit import MaxVit
    assert isinstance(m.root, MaxVit)
    assert len(m.root.blocks) == 11                      # 2+2+5+2
    assert m.root.blocks[0].window.heads == 2            # 64 / head_dim 32


def test_regnet_y_128gf_config():
    """regnet_y_128gf (the last torchvision regnet) resolves from the
    registry; the width generator yields the 4-stage partition for the
    (27, 456, 160.83, 2.52, 264) init params without building the (very
    wide) model."""
    from curvature_tpu.models.regnet import _CONFIGS, block_params

    assert "regnet_y_128gf" in models.MODEL_REGISTRY
    depth, w_0, w_a, w_m, gw, se = _CONFIGS["regnet_y_128gf"]
    widths, depths, gws = block_params(depth, w_0, w_a, w_m, gw)
    assert sum(depths) == 27 and len(widths) == 4
    assert all(w % g == 0 for w, g in zip(widths, gws))


def test_export_torch_state_dict_inverts_conversion():
    """export_torch_state_dict is the exact inverse of
    convert_torch_state_dict: torch -> ours -> torch reproduces every key
    and value. mobilenet_v3_small covers conv/depthwise/BN/SE/classifier;
    the tiny ViT covers Linear, packed in_proj/out_proj pseudo-layers,
    LayerNorm, and raw class_token/pos_embedding tensors."""
    from tests.torch_zoo import TorchMobileNetV3, TorchViT
    from curvature_tpu.models.mobilenet import _V3_SMALL
    from curvature_tpu.models.torch_convert import export_torch_state_dict

    for tmodel in (TorchMobileNetV3(_V3_SMALL, 1024, num_classes=10),
                   TorchViT(image_size=32, patch_size=8, dim=64, depth=2,
                            heads=2, mlp_dim=128, num_classes=10)):
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        back = export_torch_state_dict(convert_torch_state_dict(sd))
        assert set(back) == set(sd), (
            set(back) ^ set(sd))
        for k in sd:
            np.testing.assert_allclose(back[k], np.asarray(sd[k]),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=k)
