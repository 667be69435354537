from functools import partial

from curvature_tpu.models.mlp import mlp
from curvature_tpu.models.lenet5 import lenet5
from curvature_tpu.models.resnet import (
    resnet18, resnet34, resnet50, resnet101, resnet152, resnet,
)
from curvature_tpu.models.densenet import (
    densenet, densenet121, densenet161, densenet169, densenet201,
)
from curvature_tpu.models.transformer import tiny_transformer
from curvature_tpu.models.transformer2 import transformer_encoder
from curvature_tpu.models.vgg import vgg, vgg11, vgg13, vgg16, vgg19
from curvature_tpu.models.googlenet import googlenet
from curvature_tpu.models.inception import inception_v3
from curvature_tpu.models.vit import (
    vit, vit_b_16, vit_b_32, vit_l_16, vit_l_32, vit_h_14,
)
from curvature_tpu.models.mnasnet import mnasnet, mnasnet1_0
from curvature_tpu.models.swin import swin, swin_t
from curvature_tpu.models.maxvit import maxvit, maxvit_t
from curvature_tpu.models.mobilenet import (
    mobilenet_v2, mobilenet_v3_large, mobilenet_v3_small,
)
from curvature_tpu.models.efficientnet import efficientnet, efficientnet_b0
from curvature_tpu.models.shufflenet import shufflenet_v2, shufflenet_v2_x1_0
from curvature_tpu.models.convnext import convnext, convnext_tiny
from curvature_tpu.models.regnet import regnet
from curvature_tpu.models.alexnet import alexnet
from curvature_tpu.models.squeezenet import (
    squeezenet, squeezenet1_0, squeezenet1_1,
)
from curvature_tpu.models.gpt import (
    gpt2_tiny, gpt2, gpt2_medium, gpt2_large, gpt2_xl, gpt2_custom,
    gpt2_moe_tiny, gpt2_moe_custom,
    convert_gpt2_state_dict,
)
from curvature_tpu.models.torch_convert import (
    convert_torch_state_dict, export_torch_state_dict,
    load_torch_checkpoint, stack_scan_groups, unstack_scan_groups,
)

#: name -> constructor(num_classes=..., **kw), the analogue of the
#: reference's ``getattr(torchvision.models, args.model)`` dispatch
#: (reference scripts/factors.py:80-84) — every zoo model is reachable
#: from every pipeline CLI by name.
MODEL_REGISTRY = {
    "lenet5": lenet5,
    "mlp": lambda num_classes=10, **kw: mlp([128, 64], num_classes),
    **{a: partial(resnet, a) for a in
       ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
        "resnext50_32x4d", "resnext101_32x8d", "resnext101_64x4d",
        "wide_resnet50_2", "wide_resnet101_2")},
    **{a: partial(densenet, a) for a in
       ("densenet121", "densenet161", "densenet169", "densenet201")},
    **{a: partial(vgg, a) for a in ("vgg11", "vgg13", "vgg16", "vgg19")},
    **{f"{a}_bn": partial(vgg, a, batch_norm=True)
       for a in ("vgg11", "vgg13", "vgg16", "vgg19")},
    "googlenet": googlenet,
    "inception_v3": inception_v3,
    "vit_b_16": vit_b_16,
    "vit_b_32": vit_b_32,
    "mobilenet_v2": mobilenet_v2,
    "mobilenet_v3_large": mobilenet_v3_large,
    "mobilenet_v3_small": mobilenet_v3_small,
    **{a: partial(efficientnet, a) for a in
       ("efficientnet_b0", "efficientnet_b1", "efficientnet_b2",
        "efficientnet_b3", "efficientnet_b4", "efficientnet_b5",
        "efficientnet_b6", "efficientnet_b7",
        "efficientnet_v2_s", "efficientnet_v2_m", "efficientnet_v2_l")},
    **{a: partial(shufflenet_v2, a) for a in
       ("shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
        "shufflenet_v2_x1_5", "shufflenet_v2_x2_0")},
    "squeezenet1_0": squeezenet1_0,
    "squeezenet1_1": squeezenet1_1,
    **{a: partial(convnext, a) for a in
       ("convnext_tiny", "convnext_small", "convnext_base",
        "convnext_large")},
    **{a: partial(regnet, a) for a in
       ("regnet_y_400mf", "regnet_y_800mf", "regnet_y_1_6gf",
        "regnet_y_3_2gf", "regnet_y_8gf", "regnet_y_16gf", "regnet_y_32gf",
        "regnet_y_128gf",
        "regnet_x_400mf", "regnet_x_800mf", "regnet_x_1_6gf",
        "regnet_x_3_2gf", "regnet_x_8gf", "regnet_x_16gf",
        "regnet_x_32gf")},
    "alexnet": alexnet,
    "vit_l_16": vit_l_16,
    "vit_l_32": vit_l_32,
    "vit_h_14": vit_h_14,
    **{f"mnasnet{s}": partial(mnasnet, a)
       for s, a in (("0_5", 0.5), ("0_75", 0.75), ("1_0", 1.0),
                    ("1_3", 1.3))},
    **{a: partial(swin, a) for a in
       ("swin_t", "swin_s", "swin_b",
        "swin_v2_t", "swin_v2_s", "swin_v2_b")},
    "maxvit_t": maxvit_t,
    # decoder-only causal LMs (num_classes = vocab size); scan_blocks=True
    # recommended at gpt2_large/xl depth (O(1)-depth compile, nn/scan.py)
    "gpt2_tiny": gpt2_tiny,
    "gpt2": gpt2,
    "gpt2_medium": gpt2_medium,
    "gpt2_large": gpt2_large,
    "gpt2_xl": gpt2_xl,
    "gpt2_moe_tiny": gpt2_moe_tiny,
}


def build(name: str, num_classes: int = 1000, **kw):
    """Build a zoo model by torchvision-style name."""
    try:
        ctor = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: "
            f"{', '.join(sorted(MODEL_REGISTRY))}") from None
    return ctor(num_classes=num_classes, **kw)


__all__ = [
    "mlp", "lenet5",
    "resnet", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "densenet", "densenet121", "densenet161", "densenet169", "densenet201",
    "vgg", "vgg11", "vgg13", "vgg16", "vgg19", "googlenet", "inception_v3",
    "vit", "vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32", "vit_h_14",
    "mnasnet", "mnasnet1_0", "swin", "swin_t", "maxvit", "maxvit_t",
    "mobilenet_v2", "mobilenet_v3_large",
    "mobilenet_v3_small", "efficientnet", "efficientnet_b0",
    "shufflenet_v2", "shufflenet_v2_x1_0",
    "squeezenet", "squeezenet1_0", "squeezenet1_1",
    "convnext", "convnext_tiny", "regnet", "alexnet",
    "tiny_transformer", "transformer_encoder",
    "convert_torch_state_dict", "export_torch_state_dict",
    "load_torch_checkpoint", "stack_scan_groups", "unstack_scan_groups",
    "gpt2_tiny", "gpt2", "gpt2_medium", "gpt2_large", "gpt2_xl", "gpt2_custom",
    "gpt2_moe_tiny", "gpt2_moe_custom",
    "convert_gpt2_state_dict",
    "MODEL_REGISTRY", "build",
]
