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


def resolve_padding(padding: Union[str, Sequence[Tuple[int, int]]],
                    h: int, w: int,
                    kernel_size: Tuple[int, int],
                    strides: Tuple[int, int] = (1, 1)):
    """Normalize 'SAME'/'VALID'/explicit conv padding to
    ``((pt, pb), (pl, pr))`` with XLA's stride-aware SAME semantics
    (out = ceil(in/s); the low side gets floor(total/2)).

    Single source of truth — used by the XLA, Pallas, and correlation
    Gram paths so the three can never drift."""
    if padding == "SAME":
        kh, kw = kernel_size
        sh, sw = strides

        def same(n, k, s):
            total = max((-(-n // s) - 1) * s + k - n, 0)
            return (total // 2, total - total // 2)
        return same(h, kh, sh), same(w, kw, sw)
    if padding == "VALID":
        return (0, 0), (0, 0)
    (pt, pb), (pl, pr) = padding
    return (int(pt), int(pb)), (int(pl), int(pr))


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
