"""Depth-scanned block stacks: compile cost O(1) in depth.

Deep transformers pay XLA compile time linear in depth when blocks are
unrolled Python loops — the round-2 ViT-B/16 EFB chain had to run with
``--scan_chunk 1`` because the unrolled scan-of-8 program blew the compile
budget (benchmarks/NOTES.md). :class:`ScanBlocks` instead builds ONE block
template and runs it under ``jax.lax.scan`` over stacked ``[depth, ...]``
parameters — the TPU-native formulation (trace once, reuse for every layer).

Curvature capture composes with the scan because capture is functional
(nn/core.py): the per-depth block runs in a fresh inner :class:`Context`, and
its captured activations / recorded pre-activations / updated batch stats
come back as the scan's stacked outputs. Tracked layers inside the scan
register their :class:`LayerMeta` with ``stacked=depth``; estimators vmap
their per-layer factor math over that axis, so factor state is stacked
``[depth, ...]`` — which also feeds the shape-grouped batched eigh/cholesky
paths (ops/linalg.py) with ideal batching.

The reference has no analogue (PyTorch hooks re-trace nothing; compile time
is not its constraint) — this module exists purely for the XLA compilation
model.
"""
from dataclasses import replace
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import Context, Module


class ScanBlocks(Module):
    """Run ``depth`` structurally-identical blocks via ``lax.scan``.

    Args:
      make_block: ``prefix -> Module`` factory; every tracked layer inside
        must be named under ``f"{prefix}."``. Called once — the returned
        block is the template for all depths.
      depth: number of stacked repetitions.
      name: parameter/meta name prefix (the template's ``prefix``).
      per_depth_names: optional ``[depth]`` list of per-depth name prefixes
        in an *unstacked* naming scheme (e.g. torchvision's
        ``encoder.layers.encoder_layer_{i}``). Recorded on the model as
        ``scan_groups`` so checkpoint converters can gather per-depth
        tensors into the stacked layout (models/torch_convert.py).
    """

    def __init__(self, make_block: Callable[[str], Module], depth: int,
                 name: str,
                 per_depth_names: Optional[List[str]] = None):
        if depth < 1:
            raise ValueError("ScanBlocks needs depth >= 1")
        self.name = name
        self.depth = depth
        self.block = make_block(name)
        self.per_depth_names = per_depth_names
        self._param_layers: Optional[List[str]] = None
        self._stat_layers: Optional[List[str]] = None
        self._tracked: Optional[List[str]] = None

    # -- init: run the template once per depth, stack the results ----------
    def _init(self, ctx: Context, x):
        rng = ctx._init_rng
        per_params, per_stats = [], []
        out, metas = x, None
        for _ in range(self.depth):
            rng, key = jax.random.split(rng)
            sub = Context(init_rng=key)
            sub.train = ctx.train
            out = self.block(sub, x)
            if out.shape != x.shape:
                raise ValueError(
                    f"ScanBlocks body must preserve the carry shape; got "
                    f"{x.shape} -> {out.shape}")
            per_params.append(sub.params)
            per_stats.append(sub.batch_stats)
            metas = sub.metas
        ctx._init_rng = rng
        for layer, sub_p in per_params[0].items():
            ctx.params[layer] = {
                k: jnp.stack([pd[layer][k] for pd in per_params])
                for k in sub_p}
        for layer, sub_s in per_stats[0].items():
            ctx.batch_stats[layer] = {
                k: jnp.stack([sd[layer][k] for sd in per_stats])
                for k in sub_s}
        for m in metas.values():
            if m.stacked:
                raise ValueError(
                    f"{m.name}: already-stacked layers (MoE, nested "
                    "ScanBlocks) inside a ScanBlocks body are not supported "
                    "— the single leading stack axis cannot carry both")
            ctx.register_meta(replace(m, stacked=self.depth))
        ctx.scan_groups[self.name] = {
            "depth": self.depth,
            "per_depth_names": self.per_depth_names,
            "param_layers": sorted(per_params[0]),
            "stat_layers": sorted(per_stats[0]),
        }
        self._param_layers = sorted(per_params[0])
        self._stat_layers = sorted(per_stats[0])
        self._tracked = list(metas)
        return out

    def __call__(self, ctx: Context, x):
        if ctx.initializing:
            return self._init(ctx, x)
        if self._param_layers is None:
            # apply on a rebuilt module object: recover the layer lists from
            # the params present (model.init populated them under our prefix)
            prefix = self.name + "."
            self._param_layers = sorted(
                k for k in ctx.params if k.startswith(prefix)
                or k.startswith(self.name + "/"))
            self._stat_layers = sorted(
                k for k in ctx.batch_stats if k.startswith(prefix)
                or k.startswith(self.name + "/"))
            self._tracked = None

        xs = {
            "p": {l: ctx.params[l] for l in self._param_layers},
            "s": {l: ctx.batch_stats[l] for l in self._stat_layers},
        }
        if ctx.probes is not None:
            names = (self._tracked if self._tracked is not None
                     else self._param_layers)
            xs["pr"] = {k: ctx.probes[k] for k in names if k in ctx.probes}

        train = ctx.train
        capture = ctx.capture
        record_preacts = ctx.record_preacts
        has_probes = ctx.probes is not None

        def body(h, sl):
            sub = Context(params=sl["p"], batch_stats=sl["s"], train=train,
                          capture=capture,
                          probes=sl["pr"] if has_probes else None,
                          record_preacts=record_preacts)
            y = self.block(sub, h)
            return y, {"acts": sub.acts, "preacts": sub.preacts,
                       "stats": sub.new_stats}

        y, ys = jax.lax.scan(body, x, xs)
        ctx.acts.update(ys["acts"])
        ctx.preacts.update(ys["preacts"])
        for layer, stats in ys["stats"].items():
            for key, val in stats.items():
                ctx.update_stat(layer, key, val)
        return y
