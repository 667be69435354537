"""High-level Laplace facade: fit -> tune -> predict in three calls.

Mirrors the ergonomics of the laplace-torch package (``Laplace(model, ...);
la.fit(loader); la.optimize_prior_precision(); la(x)``) on top of this
framework's estimators, so users migrating from either DLR-RM/curvature or
laplace-torch get a one-screen entry point::

    from curvature_tpu import laplace
    la = laplace.fit(model, variables, train_batches, estimator="kfac",
                     subset="last", rng=jax.random.PRNGKey(0))
    la.optimize_prior_precision()            # evidence gradient ascent
    probs = la.predictive(x, method="linearized")

Everything here delegates to the underlying toolbox: estimators/*,
eval/marglik.py (evidence + gradient tuning), eval/predictive.py (GLM and
closed-form predictives). The estimator object stays accessible as
``la.estimator`` for the full low-level surface.
"""
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from curvature_tpu import estimators as E


class Laplace:
    def __init__(self, model, variables: Dict, estimator, train_data=None,
                 pre_scale: float = 1.0):
        self.model = model
        self.variables = variables
        self.estimator = estimator
        self.pre_scale = float(pre_scale)
        self._train_data = train_data
        self._nll = None
        self.norms = None           # tuned per-layer prior precisions
        self.scales = None          # tuned per-layer curvature scales

    # -- evidence -------------------------------------------------------------
    def map_nll(self) -> float:
        """Summed MAP NLL over the fit data (cached; constant in damping)."""
        if self._nll is None:
            if self._train_data is None:
                raise ValueError("no train_data was given to fit()")
            from curvature_tpu.eval.marglik import dataset_map_nll
            self._nll = dataset_map_nll(
                self.model, self.variables, self._train_data,
                loss=getattr(self.estimator, "loss", "cross_entropy"))
        return self._nll

    def log_marginal_likelihood(self, add=None, multiply=None) -> float:
        """Evidence at (add, multiply), defaulting to the TUNED damping —
        including the pre_scale factor the tuner and invert() applied
        (multiply is the FULL curvature scale; pass pre_scale * scale
        when supplying it manually)."""
        from curvature_tpu.eval.marglik import log_marginal_likelihood
        add = self.norms if add is None else add
        if multiply is None and self.scales is not None:
            multiply = self.pre_scale * self.scales
        if add is None or multiply is None:
            raise ValueError("pass (add, multiply) or run "
                             "optimize_prior_precision() first")
        return log_marginal_likelihood(self.estimator, self.map_nll(),
                                       add, multiply)

    def optimize_prior_precision(self, method: str = "marglik",
                                 steps: int = 200, lr: float = 0.1,
                                 per_layer: bool = False) -> Dict:
        """Tune damping; ``marglik`` = evidence gradient ascent (no eval
        passes). The tuned values are kept and used by predictive()."""
        if method != "marglik":
            raise ValueError("only method='marglik' is supported here; use "
                             "pipelines.hyper for validation-cost BayesOpt")
        from curvature_tpu.eval.marglik import marglik_gradient_tune
        res = marglik_gradient_tune(self.estimator, self.map_nll(),
                                    steps=steps, lr=lr,
                                    pre_scale=self.pre_scale,
                                    per_layer=per_layer)
        self.norms, self.scales = res["norms"], res["scales"]
        self.estimator.invert(self.norms, self.pre_scale * self.scales)
        return res

    # -- prediction -----------------------------------------------------------
    def _logit_ensemble(self, x, samples, rng, linearized):
        """[S, B, K] (and MAP logits when linearized) with the jitted
        forwards and the drawn ensemble CACHED on the instance — per-batch
        serving must not rebuild jit wrappers or re-draw samples (each
        rebuild is a full retrace; see docs/design.md hardware rules)."""
        if not hasattr(self, "_fwd_cache"):
            self._fwd_cache = {}
            self._ens_cache = {}
        ens_key = (samples, tuple(int(v) for v in jax.device_get(rng)))
        if self._ens_cache.get("key") != ens_key or \
                self._ens_cache.get("inv") is not self.estimator.inv_state:
            # re-inversion (new damping) must invalidate the drawn ensemble
            self._ens_cache = {
                "key": ens_key, "inv": self.estimator.inv_state,
                "ens": self.estimator.ensemble_params(rng, samples)}
        ens = self._ens_cache["ens"]
        stats = self.variables.get("batch_stats", {})
        if linearized:
            from curvature_tpu.eval.predictive import \
                make_linearized_ensemble_fn
            if "lin" not in self._fwd_cache:
                self._fwd_cache["lin"] = make_linearized_ensemble_fn(
                    self.model)
            return self._fwd_cache["lin"](self.estimator.mean_params, ens,
                                          stats, jnp.asarray(x))
        from curvature_tpu.eval.predictive import make_logit_ensemble_fn
        if "logit" not in self._fwd_cache:
            self._fwd_cache["logit"] = make_logit_ensemble_fn(self.model)
        return None, self._fwd_cache["logit"](ens, stats, jnp.asarray(x))

    def predictive(self, x, method: str = "sampled", samples: int = 30,
                   rng: Optional[jax.Array] = None):
        """Posterior predictive probabilities [B, K] for one batch.

        ``method``: 'sampled' (MC push-through, the reference's default) |
        'probit' | 'bridge' (closed-form on sampled-logit moments) |
        'linearized' (GLM; optionally 'linearized_probit' /
        'linearized_bridge')."""
        if self.estimator.inv_state is None:
            raise ValueError("invert first: optimize_prior_precision() or "
                             "estimator.invert(add, multiply)")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        known = ("sampled", "probit", "bridge", "linearized",
                 "linearized_probit", "linearized_bridge")
        if method not in known:
            raise ValueError(f"unknown predictive method {method!r}")
        linearized = method.startswith("linearized")
        logits0, logits_s = self._logit_ensemble(x, samples, rng, linearized)
        sub = method[len("linearized"):].lstrip("_") if linearized else method
        if sub in ("", "sampled"):
            probs = jnp.mean(jax.nn.softmax(logits_s, axis=-1), axis=0)
        else:
            from curvature_tpu.eval.predictive import (laplace_bridge,
                                                       probit_mean_field)
            mu = logits0 if linearized else jnp.mean(logits_s, axis=0)
            var = jnp.var(logits_s, axis=0)
            probs = probit_mean_field(mu, var) if sub == "probit" \
                else laplace_bridge(mu, var)[1]
        import numpy as np
        return np.asarray(probs)

    __call__ = predictive


def fit(model, variables: Dict, train_data: Iterable,
        estimator: str = "kfac", subset=None, mc_samples: int = 10,
        rng: Optional[jax.Array] = None, pre_scale: float = 1.0,
        **est_kwargs) -> Laplace:
    """Build an estimator, run the Fisher accumulation over ``train_data``
    and return a :class:`Laplace` handle.

    ``subset``: ``layer_filter`` spec ('last' or fnmatch patterns) for
    subnetwork Laplace. ``estimator``: diag | kfac | block | efb | inf
    (efb/inf chain their prerequisite fits automatically — one extra pass
    per prerequisite, matching the reference's factors.py pipeline order).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    train_data = list(train_data)

    def run_updates(est, key):
        for x, _ in train_data:
            key, k = jax.random.split(key)
            est.update(x, rng=k, num_samples=mc_samples)
        return est

    name = estimator.lower()
    rank = est_kwargs.pop("rank", 100)
    kw = dict(layer_filter=subset, **est_kwargs)
    if name == "diag":
        est = run_updates(E.Diagonal(model, variables, **kw), rng)
    elif name == "block":
        est = run_updates(E.BlockDiagonal(model, variables, **kw), rng)
    elif name == "kfac":
        est = run_updates(E.KFAC(model, variables, **kw), rng)
    elif name in ("subspace", "lowrank"):
        # global low-rank Nyström Laplace (estimators/subspace.py); `rank`
        # is the sketch width
        est = run_updates(E.Subspace(model, variables, rank=rank, **kw), rng)
    elif name in ("efb", "inf"):
        kfac = run_updates(E.KFAC(model, variables, layer_filter=subset), rng)
        efb = run_updates(E.EFB(model, variables, kfac.state, **kw), rng)
        if name == "efb":
            est = efb
        else:
            diag = run_updates(E.Diagonal(model, variables,
                                          layer_filter=subset), rng)
            est = E.INF(model, variables, diag.state, kfac.state, efb.state,
                        eigvecs=efb.eigvecs, layer_filter=subset)
            est.update(rank=rank)
    else:
        raise ValueError(f"unknown estimator {estimator!r}")
    return Laplace(model, variables, est, train_data, pre_scale=pre_scale)
