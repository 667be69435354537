"""SWA-Gaussian (SWAG) posterior collected from training iterates.

Extension beyond the reference: DLR-RM/curvature can only OVERLAY
externally computed SWA/SWAG baselines in its figures (reference
visualize.py:72-113); it cannot produce them. SWAG (Maddox et al., 2019)
is the natural companion posterior to the Laplace family — same
``posterior_params`` / ``ensemble_params`` sampling surface, but the
Gaussian comes from SGD iterates instead of curvature:

    mean      = running average of collected parameter iterates,
    Sigma     = 0.5 * diag(var) + D D^T / (2 (K - 1)),

with ``D`` the deviations of the last ``max_rank`` collected iterates from
the running mean (the low-rank half) and ``var`` the running second-moment
variance (the diagonal half). Collection is a pytree ring buffer —
``collect(params)`` once per epoch over the SWA window (``--swag`` in
pipelines/training.py); evaluation plugs into ``eval_bnn`` /
``BayesianPredictor`` unchanged.

BatchNorm caveat (standard SWAG practice): sampled/averaged weights shift
the activation statistics, so models with BatchNorm should re-estimate
``batch_stats`` with :func:`update_batch_stats` before evaluation.
"""
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import Model


def _tree_to_f32(tree):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tree)


class SWAG:
    """Collect -> (optional scale) -> sample, mirroring the estimator
    lifecycle where it makes sense. ``invert(add, multiply)`` exists for
    pipeline compatibility: ``multiply`` scales the sampling covariance
    (SWAG's usual 0.5 is already folded in; 1.0 = the paper's posterior),
    ``add`` is ignored (there is no damping to invert)."""

    def __init__(self, model: Optional[Model] = None,
                 variables: Optional[Dict] = None, max_rank: int = 20):
        self.model = model
        self.variables = variables or {}
        self.max_rank = int(max_rank)
        self.n = 0
        self.mean = None         # running first moment
        self.sq_mean = None      # running second moment
        self.dev = None          # [K, ...] stacked deviations (ring buffer)
        self.scale = 1.0
        self.mean_params = None  # set by finalize(): the SWA mean

    # -- collection ---------------------------------------------------------
    def collect(self, params: Dict):
        """Fold one parameter iterate into the running moments and the
        deviation ring buffer (call once per epoch over the SWA window)."""
        p = _tree_to_f32(params)
        n = self.n
        if n == 0:
            self.mean = p
            self.sq_mean = jax.tree_util.tree_map(lambda a: a * a, p)
        else:
            self.mean = jax.tree_util.tree_map(
                lambda m, a: (n * m + a) / (n + 1), self.mean, p)
            self.sq_mean = jax.tree_util.tree_map(
                lambda s, a: (n * s + a * a) / (n + 1), self.sq_mean, p)
        dev = jax.tree_util.tree_map(lambda a, m: (a - m)[None],
                                     p, self.mean)
        if self.dev is None:
            self.dev = dev
        else:
            self.dev = jax.tree_util.tree_map(
                lambda d, e: jnp.concatenate([d, e])[-self.max_rank:],
                self.dev, dev)
        self.n = n + 1
        return self

    # -- state (de)serialization --------------------------------------------
    @property
    def state(self) -> Dict:
        assert self.n > 0, "collect() was never called"
        return {"mean": self.mean, "sq_mean": self.sq_mean,
                "dev": self.dev, "n": jnp.asarray(self.n)}

    @state.setter
    def state(self, value: Dict):
        self.mean = value["mean"]
        self.sq_mean = value["sq_mean"]
        self.dev = value["dev"]
        self.n = int(value["n"])
        self.finalize()

    def finalize(self):
        """Freeze the SWA mean as the predictive center."""
        self.mean_params = self.mean
        return self

    # -- estimator-compatible surface ----------------------------------------
    def invert(self, add=0.0, multiply=1.0):
        """Pipeline-compatibility shim: ``multiply`` scales the covariance."""
        self.scale = float(multiply)
        self.finalize()
        return self

    def _sample(self, mean, sq_mean, dev, scale, rng):
        """One posterior params pytree: mean + sqrt(Sigma) z. Pure in the
        state — the state pytrees ride as jit ARGUMENTS (closure-captured
        device arrays become re-staged HLO constants on this backend; for
        a SWAG state the constants would be the full model parameters)."""
        leaves, treedef = jax.tree_util.tree_flatten(mean)
        sq_leaves = jax.tree_util.tree_leaves(sq_mean)
        dev_leaves = jax.tree_util.tree_leaves(dev)
        k = dev_leaves[0].shape[0]
        r1, r2 = jax.random.split(rng)
        z2 = jax.random.normal(r2, (k,), jnp.float32)
        keys = jax.random.split(r1, len(leaves))
        out = []
        denom = jnp.sqrt(2.0 * max(k - 1, 1))
        s = jnp.sqrt(jnp.asarray(scale, jnp.float32))
        for leaf, sq, dv, key in zip(leaves, sq_leaves, dev_leaves, keys):
            var = jnp.clip(sq - leaf * leaf, 0.0)
            z1 = jax.random.normal(key, leaf.shape, jnp.float32)
            diag_part = jnp.sqrt(0.5 * var) * z1
            low_rank = jnp.tensordot(z2, dv, axes=1) / denom
            out.append(leaf + s * (diag_part + low_rank))
        return jax.tree_util.tree_unflatten(treedef, out)

    def posterior_params(self, rng) -> Dict:
        assert self.mean_params is not None, "finalize() (or invert) first"
        if not hasattr(self, "_jit_sample"):
            self._jit_sample = jax.jit(self._sample)
        return self._jit_sample(self.mean, self.sq_mean, self.dev,
                                self.scale, rng)

    def ensemble_params(self, rng, num_samples: int) -> Dict:
        """[S, ...]-stacked posterior pytree (vmapped; eval_bnn-ready)."""
        assert self.mean_params is not None, "finalize() (or invert) first"
        if not hasattr(self, "_jit_ensemble"):
            self._jit_ensemble = jax.jit(
                lambda mean, sq, dev, scale, r, s: jax.vmap(
                    lambda key: self._sample(mean, sq, dev, scale, key)
                )(jax.random.split(r, s)),
                static_argnums=5)
        return self._jit_ensemble(self.mean, self.sq_mean, self.dev,
                                  self.scale, rng, num_samples)


def update_batch_stats(model, params, batch_stats: Dict, data,
                       passes: int = 1) -> Dict:
    """Re-estimate BatchNorm running statistics for (averaged/sampled)
    parameters by forwarding the data in train mode — standard SWAG
    practice before evaluating a model whose weights moved. ``batch_stats``
    seeds the running estimates (pass the training-time stats)."""
    stats = dict(batch_stats)

    @jax.jit
    def step(params, stats, x):
        _, aux = model.apply({"params": params, "batch_stats": stats},
                             x, train=True)
        merged = dict(stats)
        merged.update(aux["batch_stats"])
        return merged

    for _ in range(passes):
        for x, _ in data:
            stats = step(params, stats, jnp.asarray(x))
    return stats
