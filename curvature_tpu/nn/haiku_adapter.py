"""Bring-your-own-model: run the estimators on any dm-haiku function.

Counterpart of nn/flax_adapter.py for haiku: ``hk.intercept_methods`` hooks
``hk.Linear`` / ``hk.Conv2D`` calls to record inputs and inject
pre-activation probes. Haiku layouts also match natively (Linear ``w`` is
[in, out], Conv2D ``w`` HWIO); parameter dicts are already flat
``{module_path: {w, b}}`` — only the leaf names (w/b -> kernel/bias) are
remapped.

Usage::

    def forward(x):
        return hk.Sequential([...])(x)
    model, variables = from_haiku(hk.transform(forward), hk_params, x)
    kfac = estimators.KFAC(model, variables)
"""
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import LayerMeta

_KEYMAP = {"w": "kernel", "b": "bias"}
_INV_KEYMAP = {"kernel": "w", "bias": "b"}


def _to_ours(hk_params: Dict) -> Dict:
    return {layer: {_KEYMAP.get(k, k): v for k, v in sub.items()}
            for layer, sub in hk_params.items()}


def _to_haiku(params: Dict) -> Dict:
    return {layer: {_INV_KEYMAP.get(k, k): v for k, v in sub.items()}
            for layer, sub in params.items()}


class HaikuModel:
    """Duck-typed drop-in for nn.Model backed by a hk.transform(ed) fn."""

    def __init__(self, transformed, rng_apply: bool = False):
        import haiku as hk
        self._hk = hk
        self.transformed = transformed
        self.rng_apply = rng_apply
        self.metas: Dict[str, LayerMeta] = {}

    def _make_interceptor(self, ctx: Dict):
        hk = self._hk

        def interceptor(next_f, args, kwargs, context):
            mod = context.module
            if context.method_name != "__call__" or not isinstance(
                    mod, (hk.Linear, hk.Conv2D)):
                return next_f(*args, **kwargs)
            name = mod.module_name
            x = args[0]
            if ctx.get("init"):
                if isinstance(mod, hk.Linear):
                    meta = LayerMeta(name, "dense", mod.output_size,
                                     x.shape[-1], mod.with_bias)
                else:
                    ks = mod.kernel_shape
                    ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
                    st = mod.stride
                    st = (st, st) if isinstance(st, int) else tuple(st)
                    meta = LayerMeta(name, "conv", mod.output_channels,
                                     x.shape[-1] * ks[0] * ks[1],
                                     mod.with_bias, ks, st,
                                     mod.padding if isinstance(mod.padding, str)
                                     else tuple(mod.padding))
                self.metas[name] = meta
            if ctx.get("capture"):
                ctx["acts"][name] = x
            y = next_f(*args, **kwargs)
            if ctx.get("record_preacts"):
                ctx["preacts"][name] = y
            probes = ctx.get("probes")
            if probes is not None and name in probes:
                y = y + probes[name]
            return y

        return interceptor

    def init(self, rng, x) -> Dict:
        ctx = {"init": True}
        with self._hk.intercept_methods(self._make_interceptor(ctx)):
            hk_params = self.transformed.init(rng, x)
        return {"params": _to_ours(dict(hk_params)), "batch_stats": {}}

    def apply(self, variables: Dict, x, *, train: bool = False,
              capture: bool = False, probes: Optional[Dict] = None,
              record_preacts: bool = False):
        hk_params = _to_haiku(variables["params"])
        ctx = {"capture": capture, "probes": probes,
               "record_preacts": record_preacts, "acts": {}, "preacts": {}}
        rng = jax.random.PRNGKey(0) if self.rng_apply else None
        with self._hk.intercept_methods(self._make_interceptor(ctx)):
            try:
                out = self.transformed.apply(hk_params, rng, x)
            except TypeError:   # hk.without_apply_rng signature
                out = self.transformed.apply(hk_params, x)
        aux = {"acts": ctx["acts"], "preacts": ctx["preacts"],
               "batch_stats": {}}
        return out, aux

    def preact_shapes(self, variables: Dict, x, *, train: bool = False):
        def f(v, xx):
            _, aux = self.apply(v, xx, train=train, record_preacts=True)
            return aux["preacts"]
        return jax.eval_shape(f, variables, x)

    def zero_probes(self, variables: Dict, x, *, train: bool = False) -> Dict:
        shapes = self.preact_shapes(variables, x, train=train)
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                      shapes)


def from_haiku(transformed, hk_params: Dict, sample_input,
               rng: Optional[jax.Array] = None,
               rng_apply: bool = False) -> Tuple[HaikuModel, Dict]:
    """Wrap ``hk.transform(fn)`` + params for the estimators.

    ``transformed`` should be the result of ``hk.transform`` (use
    ``hk.without_apply_rng`` upstream or set ``rng_apply=True`` for models
    that need an apply rng)."""
    model = HaikuModel(transformed, rng_apply)
    model.init(rng if rng is not None else jax.random.PRNGKey(0),
               sample_input)
    return model, {"params": _to_ours(dict(hk_params)), "batch_stats": {}}
