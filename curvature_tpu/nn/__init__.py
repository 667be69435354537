from curvature_tpu.nn.core import (
    Context, Module, Model, LayerMeta,
    param_matrix, matrix_to_delta, apply_matrix_delta,
)
from curvature_tpu.nn.flax_adapter import FlaxModel, from_flax
from curvature_tpu.nn.haiku_adapter import HaikuModel, from_haiku
from curvature_tpu.nn.layers import (
    Dense, Conv, BatchNorm, MaxPool, AvgPool, GlobalAvgPool,
    AdaptiveAvgPool, ReLU, ReLU6, SiLU, Hardsigmoid, Hardswish, GELU,
    Flatten, Sequential, MultiheadAttention, Add, Identity, MoE,
)
from curvature_tpu.nn.scan import ScanBlocks

__all__ = [
    "Context", "Module", "Model", "LayerMeta", "FlaxModel", "from_flax", "HaikuModel", "from_haiku",
    "param_matrix", "matrix_to_delta", "apply_matrix_delta",
    "Dense", "Conv", "BatchNorm", "MaxPool", "AvgPool", "GlobalAvgPool",
    "AdaptiveAvgPool",
    "ReLU", "ReLU6", "SiLU", "Hardsigmoid", "Hardswish", "GELU", "Flatten",
    "Sequential", "MultiheadAttention", "Add", "Identity", "MoE",
    "ScanBlocks",
]
