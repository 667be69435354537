from curvature_tpu.data.synthetic import synthetic_classification, synthetic_images

__all__ = ["synthetic_classification", "synthetic_images"]
