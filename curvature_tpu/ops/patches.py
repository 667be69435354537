"""Convolution patch extraction for KFAC conv factors.

The reference materializes ``F.unfold`` patches (curvatures.py:329-330) in the
torch ``[B, C*kh*kw, L]`` layout. On TPU we use
``jax.lax.conv_general_dilated_patches`` which lowers to an XLA convolution
(MXU-tiled, fused) and emits the patch feature axis with the input channel
*major* — the same (C, kh, kw) flattening order as torch's unfold, so factor
rows line up with an OIHW-flattened weight matrix.
"""
from typing import Sequence, Tuple, Union

import jax


def extract_patches(x: jax.Array,
                    kernel_size: Tuple[int, int],
                    strides: Tuple[int, int],
                    padding: Union[str, Sequence[Tuple[int, int]]]) -> jax.Array:
    """Extract convolution patches from NHWC input.

    Args:
      x: [B, H, W, C] activations (layer input).
      kernel_size: (kh, kw).
      strides: (sh, sw).
      padding: 'SAME'/'VALID' or explicit ((ph, ph), (pw, pw)).

    Returns:
      [B, H', W', C*kh*kw] patches, feature axis ordered channel-major
      (c, kh, kw) to match an OIHW-flattened weight matrix
      (reference layout: curvatures.py:329-330).
    """
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=kernel_size,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return patches
