"""Diagonal Fisher estimator.

Behavioral parity with the reference's ``Diagonal`` (curvatures.py:132-193):
  update:  state += grads^2 * batch_size       (grads of the mean loss)
  invert:  inv = sqrt(1 / (multiply * state + add))
  sample:  N(0, 1) * inv
State per layer is the [out, fan_in(+1 bias col)] matrix view.
"""
from typing import Dict

import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import Estimator
from curvature_tpu.estimators.capture import Captured


class Diagonal(Estimator):

    need_probe_grads = False

    def _state_leaf_spec(self, name, keys, shape, ax):
        """Column (tensor) parallelism: the [out, cols] diag matrix view
        shards its out-feature rows alongside the layer's kernel columns."""
        spec = super()._state_leaf_spec(name, keys, shape, ax)
        if (ax["tensor"] and name in ax["tp"] and len(shape) >= 2
                and spec[-2] is None and shape[-2] % ax["tensor_size"] == 0):
            spec[-2] = ax["tensor"]
        return spec

    def init_state(self):
        # stacked (ScanBlocks) layers carry a leading depth axis; every
        # transform below is elementwise, so no other change is needed
        return {
            name: jnp.zeros(((m.stacked,) if m.stacked else ())
                            + (m.out_features, m.mat_cols), self.dtype)
            for name, m in self.metas.items()
        }

    def update_state(self, state, cap: Captured):
        new = {}
        for name in self.metas:
            g = cap.param_grads[name].astype(self.dtype)      # [S, out, cols]
            new[name] = state[name] + cap.batch_size * jnp.sum(g * g, axis=0)
        return new

    def invert_state(self, state, add, multiply):
        inv = {}
        for i, name in enumerate(self.metas):
            inv[name] = jnp.sqrt(
                1.0 / (multiply[i] * state[name] + add[i]))
        return inv

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        out = {}
        for name in self.metas:
            rng, key = jax.random.split(rng)
            z = jax.random.normal(key, inv_state[name].shape, self.dtype)
            out[name] = z * inv_state[name]
        return out

    def solve_state(self, inv_state, deltas):
        # inv_state is sqrt(1 / (m*state + a)), so P^{-1} d = inv^2 * d
        return {name: inv_state[name] ** 2 * deltas[name].astype(self.dtype)
                for name in self.metas}

    def logdet_state(self, state, add, multiply):
        tot = jnp.zeros((), self.dtype)
        for i, name in enumerate(self.metas):
            tot += jnp.sum(jnp.log(multiply[i] * state[name] + add[i]))
        return tot

    def quad_state(self, state, add, multiply, deltas):
        tot = jnp.zeros((), self.dtype)
        for i, name in enumerate(self.metas):
            d = deltas[name].astype(self.dtype)
            tot += jnp.sum((multiply[i] * state[name] + add[i]) * d * d)
        return tot
