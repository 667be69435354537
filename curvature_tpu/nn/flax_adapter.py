"""Bring-your-own-model: run the estimators on any flax.linen module.

The reference works on "any torch.nn.Module" through hooks
(curvatures.py:44-46); the analogue here wraps a ``flax.linen`` module with
flax's method interceptors so Dense/Conv calls record their inputs and
expose pre-activation probes — no model rewrite needed.

Layout compatibility is free: flax Dense kernels are [in, out] and Conv
kernels HWIO, exactly this framework's native convention, so the canonical
[out, fan_in+1] matrix views and posterior write-back work unchanged.

Usage::

    fmodel = SomeFlaxCNN()
    fvars = fmodel.init(rng, x)
    model, variables = from_flax(fmodel, fvars, x)
    kfac = estimators.KFAC(model, variables)
"""
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import LayerMeta


def _flatten_params(nested: Dict, prefix: str = "") -> Dict[str, Dict]:
    """Nested flax params -> {path: {kernel, bias}} for tracked leaves,
    plus {path: leaf_dict} for everything else (kept whole)."""
    flat = {}
    for key, val in nested.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(val, dict) and "kernel" in val:
            flat[path] = dict(val)
        elif isinstance(val, dict):
            flat.update(_flatten_params(val, path))
        else:
            flat[path] = {"__leaf__": val}
    return flat


def _unflatten_params(flat: Dict[str, Dict]) -> Dict:
    nested: Dict = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if set(val) == {"__leaf__"}:
            node[parts[-1]] = val["__leaf__"]
        else:
            node[parts[-1]] = dict(val)
    return nested


class FlaxModel:
    """Duck-typed drop-in for nn.Model backed by a flax.linen module."""

    def __init__(self, module, train_kwargs: Optional[Callable] = None):
        import flax.linen as fnn
        self.module = module
        self._fnn = fnn
        self.metas: Dict[str, LayerMeta] = {}
        # maps train flag -> extra apply kwargs (e.g. deterministic/...)
        self._train_kwargs = train_kwargs or (lambda train: {})

    # -- interceptor ---------------------------------------------------------
    def _make_interceptor(self, ctx: Dict):
        fnn = self._fnn

        def interceptor(next_fn, args, kwargs, context):
            mod = context.module
            if context.method_name != "__call__" or not isinstance(
                    mod, (fnn.Dense, fnn.Conv)):
                return next_fn(*args, **kwargs)
            name = "/".join(p for p in mod.path if p)
            x = args[0]
            if ctx.get("init"):
                if isinstance(mod, fnn.Dense):
                    meta = LayerMeta(name, "dense", mod.features,
                                     x.shape[-1], mod.use_bias)
                else:
                    ks = tuple(mod.kernel_size)
                    strides = mod.strides or (1,) * len(ks)
                    if isinstance(strides, int):
                        strides = (strides,) * len(ks)
                    fan_in = x.shape[-1]
                    for k in ks:
                        fan_in *= k
                    meta = LayerMeta(name, "conv", mod.features, fan_in,
                                     mod.use_bias, ks, tuple(strides),
                                     mod.padding)
                self.metas[name] = meta
            if ctx.get("capture"):
                ctx["acts"][name] = x
            y = next_fn(*args, **kwargs)
            if ctx.get("record_preacts"):
                ctx["preacts"][name] = y
            probes = ctx.get("probes")
            if probes is not None and name in probes:
                y = y + probes[name]
            return y

        return interceptor

    # -- Model interface -----------------------------------------------------
    def init(self, rng, x) -> Dict:
        ctx = {"init": True}
        with self._fnn.intercept_methods(self._make_interceptor(ctx)):
            variables = self.module.init(rng, x, **self._train_kwargs(False))
        params = _flatten_params(dict(variables["params"]))
        batch_stats = dict(variables.get("batch_stats", {}))
        return {"params": params, "batch_stats": batch_stats}

    def apply(self, variables: Dict, x, *, train: bool = False,
              capture: bool = False, probes: Optional[Dict] = None,
              record_preacts: bool = False):
        nested = {"params": _unflatten_params(variables["params"])}
        if variables.get("batch_stats"):
            nested["batch_stats"] = variables["batch_stats"]
        ctx = {"capture": capture, "probes": probes,
               "record_preacts": record_preacts, "acts": {}, "preacts": {}}
        mutable = ["batch_stats"] if (train and "batch_stats" in nested) else False
        with self._fnn.intercept_methods(self._make_interceptor(ctx)):
            if mutable:
                out = self.module.apply(nested, x, mutable=mutable,
                                        **self._train_kwargs(train))
            else:
                out = self.module.apply(nested, x, **self._train_kwargs(train))
        new_stats = {}
        if mutable:
            out, updated = out
            new_stats = dict(updated.get("batch_stats", {}))
        aux = {"acts": ctx["acts"], "preacts": ctx["preacts"],
               "batch_stats": new_stats}
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


def from_flax(module, flax_variables: Dict, sample_input,
              train_kwargs: Optional[Callable] = None,
              rng: Optional[jax.Array] = None
              ) -> Tuple[FlaxModel, Dict]:
    """Wrap a flax module + its variables for the estimators.

    Returns (model, variables) in this framework's conventions (flat
    name-keyed params, separate batch_stats)."""
    model = FlaxModel(module, train_kwargs)
    # trace metas with a throwaway init
    model.init(rng if rng is not None else jax.random.PRNGKey(0),
               sample_input)
    params = _flatten_params(dict(flax_variables["params"]))
    variables = {"params": params,
                 "batch_stats": dict(flax_variables.get("batch_stats", {}))}
    return model, variables
