from curvature_tpu.models.mlp import mlp
from curvature_tpu.models.lenet5 import lenet5
from curvature_tpu.models.resnet import (
    resnet18, resnet34, resnet50, resnet101, resnet152, resnet,
)
from curvature_tpu.models.densenet import (
    densenet, densenet121, densenet161,
)
from curvature_tpu.models.transformer import tiny_transformer
from curvature_tpu.models.transformer2 import transformer_encoder
from curvature_tpu.models.vgg import vgg, vgg16, vgg19
from curvature_tpu.models.googlenet import googlenet
from curvature_tpu.models.torch_convert import (
    convert_torch_state_dict, load_torch_checkpoint,
)

__all__ = [
    "mlp", "lenet5",
    "resnet", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "densenet", "densenet121", "densenet161",
    "vgg", "vgg16", "vgg19", "googlenet",
    "tiny_transformer", "transformer_encoder",
    "convert_torch_state_dict", "load_torch_checkpoint",
]
