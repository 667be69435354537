"""Fused convolution-patch Gram kernel (Pallas, TPU).

The KFAC A-factor for a conv layer is ``P^T P / N`` where ``P`` is the
unfolded patch matrix ``[N, C*kh*kw(+1)]`` (reference: F.unfold then matmul,
curvatures.py:329-336). The XLA path materializes ``P`` in HBM — for early
ResNet layers that is hundreds of MB of write+read traffic per step. This
kernel streams activation row-strips HBM -> VMEM once, builds the patch tile
on-chip, and accumulates the Gram across the sequential grid, so ``P`` never
exists in HBM.

Scope: stride-1 convs with ``F = C*kh*kw + 1`` small enough that the
[F, F] accumulator fits VMEM (~<=1200). Callers fall back to the XLA patch
path otherwise (larger layers have small spatial extent, where patch
materialization is cheap anyway).

Internal feature order is (dy*kw+dx, c) for contiguous on-chip writes; the
returned matrix is permuted to the canonical (c, dy, dx) order, ones column
last.

STATUS: numerically validated in interpret mode (tests/test_pallas_kernels.py)
but NOT wired into the default KFAC path yet — this deployment's remote
Mosaic compile helper crashes (HTTP 500 + TPU worker restart) on the manual
ANY->VMEM halo DMA pattern, and each crash costs ~5 min of chip downtime.
The XLA patch path remains the default; revisit with a block-mapped variant
once the toolchain accepts it.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_F = 1200


def patch_gram_supported(c: int, kernel_size: Tuple[int, int],
                         strides: Tuple[int, int]) -> bool:
    kh, kw = kernel_size
    return strides == (1, 1) and c * kh * kw + 1 <= MAX_F and kh * kw > 1


def _kernel(x_hbm, out_ref, strip, p_buf, sem, *, kh, kw, c, tr, wp, w_out,
            h_out, f1):
    b = pl.program_id(0)
    r = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * tr, tr + kh - 1)], strip, sem)
    dma.start()
    dma.wait()

    n_rows = tr * w_out
    # build the patch tile: feature block k = dy*kw + dx holds the shifted
    # window, ones column last
    for dy in range(kh):
        for dx in range(kw):
            k = dy * kw + dx
            view = strip[dy:dy + tr, dx:dx + w_out, :]
            p_buf[:, k * c:(k + 1) * c] = view.reshape(n_rows, c)
    p_buf[:, kh * kw * c:] = jnp.ones((n_rows, f1 - kh * kw * c),
                                      p_buf.dtype)

    # mask rows beyond the valid output height (last row tile)
    valid = (h_out - r * tr)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    mask = (row_ids < valid * w_out).astype(p_buf.dtype)
    p = p_buf[:, :] * mask

    acc = jax.lax.dot_general(
        p, p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == 0, r == 0))
    def _():
        out_ref[:, :] = acc

    @pl.when(jnp.logical_not(jnp.logical_and(b == 0, r == 0)))
    def _():
        out_ref[:, :] = out_ref[:, :] + acc


@functools.partial(jax.jit, static_argnames=("kernel_size", "padding",
                                             "interpret"))
def patch_gram(x: jax.Array, kernel_size: Tuple[int, int],
               padding=((0, 0), (0, 0)), interpret: bool = False) -> jax.Array:
    """Sum of patch outer products with an appended ones column.

    Args:
      x: [B, H, W, C] activations.
      kernel_size: (kh, kw); stride is 1.
      padding: explicit ((ph_lo, ph_hi), (pw_lo, pw_hi)) or 'SAME'/'VALID'.

    Returns:
      [F+1, F+1] float32 where F = C*kh*kw, feature order (c, dy, dx),
      ones column last — the *unnormalized* Gram (divide by N outside).
    """
    b, h, w, c = x.shape
    kh, kw = kernel_size
    if padding == "SAME":
        ph = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
        pw = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    elif padding == "VALID":
        ph = pw = (0, 0)
    else:
        ph, pw = tuple(padding[0]), tuple(padding[1])
    h_out = h + ph[0] + ph[1] - kh + 1
    w_out = w + pw[0] + pw[1] - kw + 1
    f = c * kh * kw
    f1 = f + 1

    tr = min(h_out, max(1, 512 // w_out))      # ~512 patch rows per tile
    n_tiles = -(-h_out // tr)
    # pad so every strip DMA is full-size; masked rows contribute zeros
    pad_h = (ph[0], ph[1] + (n_tiles * tr - h_out))
    xp = jnp.pad(x, ((0, 0), pad_h, pw, (0, 0)))
    wp = xp.shape[2]

    kernel = functools.partial(_kernel, kh=kh, kw=kw, c=c, tr=tr, wp=wp,
                               w_out=w_out, h_out=h_out, f1=f1)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((f1, f1), lambda b_, r_: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f1, f1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tr + kh - 1, wp, c), x.dtype),
            pltpu.VMEM((tr * w_out, f1), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)

    # permute (k, c) feature order -> canonical (c, dy, dx); ones col stays
    k_idx = jnp.arange(f) % (kh * kw)
    c_idx = jnp.arange(f) // (kh * kw)
    perm = jnp.concatenate([k_idx * c + c_idx, jnp.array([f])])
    return out[perm][:, perm]
