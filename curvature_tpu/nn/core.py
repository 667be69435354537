"""Functional module system with curvature capture built in.

The reference captures per-layer activations and output-gradients with
PyTorch module hooks mutating dict state keyed by live layer objects
(reference: curvature/curvatures.py:297-310). That mechanism cannot exist
under ``jax.jit``. Instead:

  * every *tracked* layer (Dense/Conv, incl. attention projections) records
    its input into ``ctx.acts[name]`` when ``capture=True`` — the functional
    analogue of ``register_forward_pre_hook``;
  * every tracked layer adds a zero-valued *probe* to its pre-activation
    output ``y``; the gradient of the loss w.r.t. the probe equals dL/dy —
    the functional analogue of ``register_backward_hook``. Probes are inputs
    of the forward function, so one ``jax.vjp`` yields all layers' output
    gradients at once.

Layer identity is a string path, so factor state is a serializable pytree
(fixing the reference's un-picklable layer-object keys).
"""
from dataclasses import dataclass, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LayerMeta:
    """Static description of a tracked layer.

    ``fan_in`` counts input features (Dense) or C*kh*kw (Conv) — the row
    dimension of the first Kronecker factor, before the bias row is appended.

    ``stacked`` > 0 marks a layer living inside a :class:`ScanBlocks` depth
    scan: its params, captured activations, probes, and factor state all
    carry a leading ``[stacked]`` depth axis, and estimators vmap their
    per-layer math over it (one compiled program regardless of depth).
    """
    name: str
    kind: str                       # 'dense' | 'conv'
    out_features: int
    fan_in: int
    has_bias: bool
    kernel_size: Tuple[int, int] = ()
    strides: Tuple[int, int] = ()
    padding: Any = "VALID"
    stacked: int = 0
    groups: int = 1                 # grouped/depthwise conv: fan_in counts
                                    # only the (C/groups)*kh*kw per-group
                                    # inputs each output channel sees
    heads: int = 0                  # attention projections: num_heads (set by
                                    # MultiheadAttention; enables per-head
                                    # factor structure in KFAC)
    moe: bool = False               # mixture-of-experts layer: ``stacked``
                                    # counts EXPERTS (not scan depth) — the
                                    # same [E, ...] factor math, but sharded
                                    # over the mesh's 'expert' axis (ep)
                                    # instead of 'model'

    @property
    def mat_cols(self) -> int:
        return self.fan_in + (1 if self.has_bias else 0)


@jax.custom_vjp
def gram_tap(y: jax.Array, acc: jax.Array) -> jax.Array:
    """Identity on ``y`` whose BACKWARD emits the token Gram of the
    cotangent into ``acc``'s cotangent slot.

    ``acc`` is a zero ``[out, out]`` float32 input; ``d(outputs)/d(acc)``
    as returned by ``jax.vjp`` is ``sum_n g_n g_n^T`` over all token
    positions of this layer's pre-activation gradient. This is the fused
    alternative to the probes trick for estimators that only consume the
    *Gram* of the output gradients (KFAC G factors): the full
    ``[B, H, W, out]`` probe gradient is reduced where the backward
    produces it and never becomes a vjp output pinned in HBM (the
    reference materializes every layer's grad via backward hooks,
    curvatures.py:297-310)."""
    del acc
    return y


def _gram_tap_fwd(y, acc):
    del acc
    return y, None


def _gram_tap_bwd(_, ct):
    g = ct.reshape(-1, ct.shape[-1])
    gram = jax.lax.dot_general(g, g,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return ct, gram


gram_tap.defvjp(_gram_tap_fwd, _gram_tap_bwd)


class Context:
    """Threaded state for one forward pass (init or apply)."""

    def __init__(self,
                 params: Optional[Dict] = None,
                 batch_stats: Optional[Dict] = None,
                 *,
                 train: bool = False,
                 capture: bool = False,
                 probes: Optional[Dict] = None,
                 gram_taps: Optional[Dict] = None,
                 init_rng: Optional[jax.Array] = None,
                 record_preacts: bool = False,
                 metas: Optional[Dict[str, LayerMeta]] = None):
        self.params = params if params is not None else {}
        self.batch_stats = batch_stats if batch_stats is not None else {}
        self.new_stats: Dict = {}
        self.train = train
        self.capture = capture
        self.probes = probes
        self.gram_taps = gram_taps
        self.acts: Dict[str, jax.Array] = {}
        self.preacts: Dict[str, jax.Array] = {}
        self.record_preacts = record_preacts
        self.metas: Dict[str, LayerMeta] = metas if metas is not None else {}
        # ScanBlocks registration: {prefix: {depth, per_depth_names, ...}}
        self.scan_groups: Dict[str, Dict] = {}
        self._init_rng = init_rng
        self.initializing = init_rng is not None

    # -- parameter access -------------------------------------------------
    def param(self, layer: str, name: str, shape, initializer) -> jax.Array:
        if self.initializing:
            sub = self.params.setdefault(layer, {})
            if name not in sub:
                self._init_rng, key = jax.random.split(self._init_rng)
                sub[name] = initializer(key, shape)
            return sub[name]
        return self.params[layer][name]

    def stat(self, layer: str, name: str, shape, init_value: float) -> jax.Array:
        if self.initializing:
            sub = self.batch_stats.setdefault(layer, {})
            if name not in sub:
                sub[name] = jnp.full(shape, init_value, jnp.float32)
            return sub[name]
        return self.batch_stats[layer][name]

    def update_stat(self, layer: str, name: str, value: jax.Array):
        self.new_stats.setdefault(layer, {})[name] = value

    # -- curvature capture -------------------------------------------------
    def record_act(self, layer: str, x: jax.Array):
        if self.capture:
            self.acts[layer] = x

    def probe(self, layer: str, y: jax.Array) -> jax.Array:
        if self.record_preacts:
            self.preacts[layer] = y
        if self.probes is not None and layer in self.probes:
            y = y + self.probes[layer]
        if self.gram_taps is not None and layer in self.gram_taps:
            y = gram_tap(y, self.gram_taps[layer])
        return y

    def register_meta(self, meta: LayerMeta):
        if self.initializing:
            if meta.name in self.metas:
                raise ValueError(f"duplicate tracked layer name: {meta.name!r}")
            self.metas[meta.name] = meta


class Module:
    """Base class: a module is a callable ``(ctx, x) -> y`` with a name."""
    name: Optional[str] = None

    def __call__(self, ctx: Context, x):
        raise NotImplementedError


class Model:
    """Wraps a root module into init/apply with capture support."""

    def __init__(self, root: Module):
        self.root = root
        self.metas: Dict[str, LayerMeta] = {}
        self.scan_groups: Dict[str, Dict] = {}

    def init(self, rng: jax.Array, x: jax.Array) -> Dict:
        """Initialize parameters by tracing one forward pass.

        Returns variables ``{'params': ..., 'batch_stats': ...}`` and records
        tracked-layer metadata on the model.
        """
        ctx = Context(init_rng=rng)
        _ = self.root(ctx, x)
        self.metas = dict(ctx.metas)
        self.scan_groups = dict(ctx.scan_groups)
        return {"params": ctx.params, "batch_stats": ctx.batch_stats}

    def apply(self,
              variables: Dict,
              x: jax.Array,
              *,
              train: bool = False,
              capture: bool = False,
              probes: Optional[Dict] = None,
              gram_taps: Optional[Dict] = None,
              record_preacts: bool = False):
        """Run the forward pass.

        Returns ``(out, aux)`` with ``aux = {'acts', 'preacts', 'batch_stats'}``.
        ``aux['batch_stats']`` holds updated running stats when ``train=True``
        (empty otherwise).
        """
        ctx = Context(variables.get("params"),
                      variables.get("batch_stats"),
                      train=train, capture=capture, probes=probes,
                      gram_taps=gram_taps,
                      record_preacts=record_preacts)
        out = self.root(ctx, x)
        aux = {"acts": ctx.acts, "preacts": ctx.preacts,
               "batch_stats": ctx.new_stats}
        return out, aux

    def preact_shapes(self, variables: Dict, x, *, train: bool = False):
        """Shapes/dtypes of every tracked layer's pre-activation output.

        Used to build zero probes; evaluated abstractly (no FLOPs).
        """
        def f(v, xx):
            _, aux = self.apply(v, xx, train=train, record_preacts=True)
            return aux["preacts"]
        return jax.eval_shape(f, variables, x)

    def zero_probes(self, variables: Dict, x, *, train: bool = False) -> Dict:
        shapes = self.preact_shapes(variables, x, train=train)
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


# ---------------------------------------------------------------------------
# Matrix views: estimators operate on the canonical [out, fan_in(+1)] weight
# matrix per tracked layer (the reference's ``grads.view(shape[0], -1)`` plus
# bias column, curvatures.py:151-153). These helpers map between that view
# and the TPU-native parameter layout (dense kernel [in, out], conv HWIO).
# ---------------------------------------------------------------------------

def param_matrix(meta: LayerMeta, layer_params: Dict[str, jax.Array]) -> jax.Array:
    """Layer params -> [out, fan_in(+1 bias col)] matrix (reference layout).

    Stacked (ScanBlocks) layers map to ``[depth, out, fan_in(+1)]``."""
    if meta.stacked:
        flat = replace(meta, stacked=0)
        return jax.vmap(lambda lp: param_matrix(flat, lp))(layer_params)
    k = layer_params["kernel"]
    if meta.kind == "dense":
        mat = k.T                                       # [out, in]
    else:  # conv HWIO -> O, (C, kh, kw) flattened
        mat = jnp.transpose(k, (3, 2, 0, 1)).reshape(meta.out_features, -1)
    if meta.has_bias:
        mat = jnp.concatenate([mat, layer_params["bias"][:, None]], axis=1)
    return mat


def matrix_to_delta(meta: LayerMeta, mat: jax.Array) -> Dict[str, jax.Array]:
    """[out, fan_in(+1)] matrix -> param-tree leaf dict in native layout."""
    if meta.stacked:
        flat = replace(meta, stacked=0)
        return jax.vmap(lambda m: matrix_to_delta(flat, m))(mat)
    if meta.has_bias:
        bias = mat[:, -1]
        mat = mat[:, :-1]
    if meta.kind == "dense":
        kernel = mat.T
    else:
        kh, kw = meta.kernel_size
        c = meta.fan_in // (kh * kw)
        kernel = jnp.transpose(
            mat.reshape(meta.out_features, c, kh, kw), (2, 3, 1, 0))
    out = {"kernel": kernel}
    if meta.has_bias:
        out["bias"] = bias
    return out


def apply_matrix_delta(metas: Dict[str, LayerMeta],
                       params: Dict,
                       deltas: Dict[str, jax.Array]) -> Dict:
    """Add sampled [out, fan_in+1] offsets onto the MAP parameters.

    Functional analogue of the reference's ``sample_and_replace``
    (curvatures.py:117-129): returns a NEW params pytree, the mean is never
    mutated.
    """
    new_params = dict(params)
    for name, mat in deltas.items():
        meta = metas[name]
        d = matrix_to_delta(meta, mat)
        layer = dict(new_params[name])
        for key, val in d.items():
            layer[key] = layer[key] + val.astype(layer[key].dtype)
        new_params[name] = layer
    return new_params
