"""Exact per-layer (block-diagonal) Fisher.

Parity with the reference's ``BlockDiagonal`` (curvatures.py:196-261): the
outer product of the flattened layer gradient, O(p^2) per layer — practical
only for small layers, and doubling as the built-in exact reference that the
KFAC/EFB/INF tests validate against (SURVEY.md section 4).

Note: the reference's ``sample`` computes ``z @ L`` with ``L = chol(inv(F))``,
whose covariance is ``L^T L != inv(F)`` — a latent bug in an unused class
(curvatures.py:256-261). We sample ``L @ z`` so the covariance is exactly
``inv(F)``.
"""
from typing import Dict

import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import Estimator
from curvature_tpu.estimators.capture import Captured
from curvature_tpu.ops.linalg import chol_inv, chol_logdet, diag_add, sym


def _flatten_grad(mat: jax.Array, has_bias: bool) -> jax.Array:
    """[out, cols] matrix view -> flat vector in torch ``view(-1)`` order
    (weight rows first, then bias; curvatures.py:214-216)."""
    if has_bias:
        return jnp.concatenate([mat[:, :-1].reshape(-1), mat[:, -1]])
    return mat.reshape(-1)


class BlockDiagonal(Estimator):

    need_probe_grads = False

    def init_state(self):
        return {
            name: jnp.zeros(((m.stacked,) if m.stacked else ())
                            + (m.out_features * m.mat_cols,) * 2, self.dtype)
            for name, m in self.metas.items()
        }

    def update_state(self, state, cap: Captured):
        new = {}
        for name, meta in self.metas.items():
            g = cap.param_grads[name].astype(self.dtype)  # [S(, L), out, cols]
            if meta.stacked:
                v = jax.vmap(jax.vmap(
                    lambda m: _flatten_grad(m, meta.has_bias)))(g)
                outer = jnp.einsum("sli,slj->lij", v, v,
                                   preferred_element_type=self.dtype)
            else:
                v = jax.vmap(lambda m: _flatten_grad(m, meta.has_bias))(g)
                outer = jnp.einsum("si,sj->ij", v, v,
                                   preferred_element_type=self.dtype)
            new[name] = state[name] + cap.batch_size * outer
        return new

    def invert_state(self, state, add, multiply):
        # diag_add / chol_inv are batched over leading dims (stacked layers)
        inv = {}
        for i, name in enumerate(self.metas):
            damped = diag_add(multiply[i] * state[name], add[i])
            inv[name] = chol_inv(sym(damped))
        return inv

    def logdet_state(self, state, add, multiply):
        tot = jnp.zeros((), self.dtype)
        for i, name in enumerate(self.metas):
            damped = diag_add(multiply[i] * state[name], add[i])
            tot += jnp.sum(chol_logdet(damped))
        return tot

    def quad_state(self, state, add, multiply, deltas):
        tot = jnp.zeros((), self.dtype)
        for i, (name, meta) in enumerate(self.metas.items()):
            damped = sym(diag_add(multiply[i] * state[name], add[i]))
            d = deltas[name].astype(self.dtype)
            if meta.stacked:
                v = jax.vmap(lambda m: _flatten_grad(m, meta.has_bias))(d)
                tot += jnp.einsum("li,lij,lj->", v, damped, v)
            else:
                v = _flatten_grad(d, meta.has_bias)
                tot += v @ (damped @ v)
        return tot

    def solve_state(self, inv_state, deltas):
        # inv_state holds L = chol(P^{-1}) per flattened block, so
        # P^{-1} d = L (L^T d) — exact, no triangular solve needed
        out = {}
        for name, meta in self.metas.items():
            d = deltas[name].astype(self.dtype)

            def one(mat, l, meta=meta):
                x = l @ (l.T @ _flatten_grad(mat, meta.has_bias))
                if meta.has_bias:
                    w = x[:meta.out_features * meta.fan_in].reshape(
                        meta.out_features, meta.fan_in)
                    return jnp.concatenate([w, x[meta.out_features *
                                                 meta.fan_in:][:, None]],
                                           axis=1)
                return x.reshape(meta.out_features, meta.fan_in)

            out[name] = jax.vmap(one)(d, inv_state[name]) if meta.stacked \
                else one(d, inv_state[name])
        return out

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        out = {}
        for name, meta in self.metas.items():
            rng, key = jax.random.split(rng)
            l = inv_state[name]
            z = jax.random.normal(key, l.shape[:-1], self.dtype)
            x = jnp.einsum("...ij,...j->...i", l, z)

            def unflatten(vec):
                if meta.has_bias:
                    w = vec[:meta.out_features * meta.fan_in].reshape(
                        meta.out_features, meta.fan_in)
                    b = vec[meta.out_features * meta.fan_in:][:, None]
                    return jnp.concatenate([w, b], axis=1)
                return vec.reshape(meta.out_features, meta.fan_in)

            out[name] = jax.vmap(unflatten)(x) if meta.stacked \
                else unflatten(x)
        return out
