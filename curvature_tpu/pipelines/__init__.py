from curvature_tpu.pipelines.common import build_model, build_data, input_shape

__all__ = ["build_model", "build_data", "input_shape"]
