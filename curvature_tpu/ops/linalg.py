"""Core linear algebra for curvature factors.

TPU-native equivalents of the reference's utility math
(reference: curvature/utils.py:21-60 ``get_eigenvalues``/``get_eigenvectors``,
curvature/utils.py:288-310 ``kron``, and the damped inversion inside each
estimator's ``invert``, e.g. curvature/curvatures.py:354-385).

Everything here is a pure function of arrays, jit/vmap-friendly, with no
Python-level per-layer loops inside — per-layer batching happens by stacking
same-shaped factors (``group_by_shape``) and vmapping.
"""
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def kron(a: jax.Array, b: jax.Array) -> jax.Array:
    """Kronecker product of two matrices.

    Equivalent to the reference's einsum-based ``kron`` (utils.py:288-310).

    >>> import numpy as np
    >>> np.asarray(kron(jnp.array([[1., 2.], [3., 4.]]),
    ...                 jnp.array([[0., 5.], [6., 7.]])))[0].tolist()
    [0.0, 5.0, 0.0, 10.0]
    """
    m, n = a.shape
    p, q = b.shape
    return (a[:, None, :, None] * b[None, :, None, :]).reshape(m * p, n * q)


def sym(a: jax.Array) -> jax.Array:
    """Symmetrize: (A + A^T) / 2. Batched over leading dims."""
    return (a + jnp.swapaxes(a, -1, -2)) / 2.0


def diag_add(a: jax.Array, value) -> jax.Array:
    """A + value * I for the trailing square dims; batched over leading dims."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    return a + jnp.asarray(value, a.dtype) * eye


def eigh_sym(a: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition of ``A + A^T`` (note: *sum*, not average).

    The reference symmetrizes KFAC factors as ``A + A.t()`` before
    ``torch.symeig`` (utils.py:56-58), which doubles the eigenvalues but
    leaves eigenvectors unchanged; downstream only the eigenvectors are used,
    so we reproduce the exact operand for parity.

    Returns (eigenvalues ascending, eigenvectors as columns).
    """
    return jnp.linalg.eigh(a + jnp.swapaxes(a, -1, -2))


def chol_inv(a: jax.Array) -> jax.Array:
    """Lower Cholesky factor of ``inv(A)`` for SPD ``A``; batched.

    Matches the reference's ``A.inverse().cholesky()`` chain
    (curvatures.py:377-379) but computed via triangular identities:
    with ``A = L L^T``, ``inv(A) = L^{-T} L^{-1}`` and
    ``chol(inv(A)) = P`` where ``P`` is obtained by Cholesky of the explicit
    inverse. We form the inverse with ``cho_solve`` (stable) and one final
    Cholesky — two small-matrix factorizations, no general LU.
    """
    l = jnp.linalg.cholesky(a)
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    # inv(A) = L^-T (L^-1 I)
    linv = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
    a_inv = jnp.swapaxes(linv, -1, -2) @ linv
    return jnp.linalg.cholesky(sym(a_inv))


def chol_logdet(a: jax.Array) -> jax.Array:
    """``log det`` of SPD ``a`` via Cholesky; batched over leading dims
    (returns one logdet per leading-dim block)."""
    l = jnp.linalg.cholesky(sym(a))
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)),
                         axis=-1)


def damped_inverse_cholesky(factor: jax.Array, add, multiply) -> jax.Array:
    """Cholesky of the inverse of the split-damped factor.

    Reproduces KFAC's split-damping trick (curvatures.py:368-379):
        reg = sqrt(multiply) * F + sqrt(add) * I, symmetrized,
        return chol(inv(reg)).
    Batched over leading dims; ``add``/``multiply`` broadcast.
    """
    s = jnp.sqrt(jnp.asarray(multiply, factor.dtype))
    n = jnp.sqrt(jnp.asarray(add, factor.dtype))
    s = s.reshape(s.shape + (1,) * (factor.ndim - s.ndim))
    n = n.reshape(n.shape + (1,) * (factor.ndim - n.ndim))
    eye = jnp.eye(factor.shape[-1], dtype=factor.dtype)
    reg = s * factor + n * eye
    return chol_inv(sym(reg))


def group_by_shape(arrays: Dict[str, jax.Array]):
    """Group a dict of arrays by shape for batched linalg.

    Returns a list of ``(names, stacked)`` tuples where ``stacked`` has a new
    leading axis over the grouped names. Use to run one vmapped
    eigh/cholesky per distinct factor dimension instead of one call per layer
    (SURVEY.md section 7, hard part 3).
    """
    groups: Dict[Tuple[tuple, str], List[str]] = defaultdict(list)
    for name, arr in arrays.items():
        groups[(tuple(arr.shape), str(arr.dtype))].append(name)
    out = []
    for (_, _), names in groups.items():
        stacked = jnp.stack([arrays[n] for n in names])
        out.append((names, stacked))
    return out


def ungroup(groups: Sequence[Tuple[List[str], jax.Array]]) -> Dict[str, jax.Array]:
    """Inverse of :func:`group_by_shape` after a batched op."""
    out = {}
    for names, stacked in groups:
        for i, n in enumerate(names):
            out[n] = stacked[i]
    return out


def grouped_gram_packed(t: jax.Array, dtype=jnp.float32,
                        lane: int = 128) -> jax.Array:
    """Per-group token Grams ``[g, c, c]`` from tokens ``[N, g, c]``,
    MXU-tile-packed.

    A grouped/depthwise conv's per-group factor blocks are tiny (ResNeXt-50:
    c = 37; depthwise 3x3: c = 10) — far below the 128x128 MXU tile, so the
    naive batched einsum ``ngi,ngj->gij`` burns one full tile pass over the
    token stream PER GROUP at (c/128)^2 output utilization. Packing
    P = lane//c adjacent groups into one lane-width operand computes P group
    Grams per tile pass (the discarded cross-group blocks are tile slack the
    MXU would have idled through anyway), cutting token-stream passes by P.
    The group axis is zero-padded up to a multiple of P (zero tokens make
    exactly-zero Grams, dropped on extraction).

    The extracted diagonal blocks are the same token-dot-products the naive
    einsum computes, accumulated in ``dtype`` either way.

    MEASURED SLOWER on a real v5e (benchmarks/grouped_pack_ab.py, NOTES.md
    round-3): 0.67-1.07x vs the naive einsum standalone, and a -21%
    end-to-end regression on the efficientnet_b0 KFAC update — the op is
    bound by streaming the ``[N, g, c]`` tokens from HBM (which both
    formulations read in full) plus the operand relayout the packing adds,
    not by MXU tile passes. Kept as the benchmarked alternative; the
    estimators use the naive einsum (estimators/kfac.py ``_a_factor``).
    """
    n, g, c = t.shape
    p = min(g, max(1, lane // c))
    if p <= 1:
        return jnp.einsum("ngi,ngj->gij", t, t,
                          preferred_element_type=dtype)
    g_pad = -(-g // p) * p
    if g_pad != g:
        t = jnp.pad(t, ((0, 0), (0, g_pad - g), (0, 0)))
    tp = t.reshape(n, g_pad // p, p * c)
    packed = jnp.einsum("nki,nkj->kij", tp, tp,
                        preferred_element_type=dtype)
    blocks = packed.reshape(g_pad // p, p, c, p, c)
    idx = jnp.arange(p)
    out = blocks[:, idx, :, idx, :]            # [p, g_pad/p, c, c]
    out = jnp.swapaxes(out, 0, 1).reshape(g_pad, c, c)
    return out[:g]
