"""Estimator base class: the ``update -> invert -> sample`` lifecycle.

API parity with the reference's ``Curvature`` ABC (curvature/curvatures.py:17-129)
under a functional design:

  * ``state`` / ``inv_state`` are pytrees keyed by layer *name* (serializable,
    shardable), not live module objects;
  * the pure transforms ``update_state``, ``invert_state``, ``sample_state``
    are jitted once and reused (hyperopt re-inversion never recompiles —
    add/multiply are traced arguments);
  * ``sample_and_replace`` becomes ``posterior_params`` (returns a NEW params
    pytree) and ``ensemble_params`` (vmapped over Monte-Carlo samples so a
    30-sample Bayesian eval is one batched forward).
"""
from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import LayerMeta, Model, apply_matrix_delta
from curvature_tpu.ops.patches import extract_patches
from curvature_tpu.estimators.capture import Captured, collect

#: reference-compatible layer-type aliases (curvatures.py:57-63)
_TYPE_ALIASES = {
    "Linear": "linear", "Conv2d": "conv", "MultiheadAttention": "attention",
    "linear": "linear", "dense": "linear", "conv": "conv",
    "attention": "attention",
}


def _meta_type(meta: LayerMeta) -> str:
    if meta.kind == "conv":
        return "conv"
    if meta.name.endswith("/in_proj") or meta.name.endswith("/out_proj"):
        return "attention"
    return "linear"


def filter_metas(metas: Dict[str, LayerMeta], layer_filter) -> Dict:
    """Restrict tracked layers by NAME (subnetwork Laplace).

    ``layer_filter`` is ``"last"`` (the final tracked layer — last-layer
    Laplace, the standard cheap posterior over the network head) or one/
    several ``fnmatch`` patterns against layer names (``"fc*"``,
    ``"*block3*"``). Extension beyond the reference, whose selection is by
    layer *type* only (curvatures.py:57-63); modern Laplace practice
    (laplace-torch) treats the subnetwork choice as a first-class knob.
    """
    if layer_filter is None:
        return dict(metas)
    if isinstance(layer_filter, str):
        layer_filter = [layer_filter]
    patterns = [p for p in layer_filter if p]
    if patterns == ["last"]:
        last = list(metas)[-1]
        return {last: metas[last]}
    import fnmatch
    kept = {n: m for n, m in metas.items()
            if any(fnmatch.fnmatch(n, p) for p in patterns)}
    if not kept:
        raise ValueError(
            f"layer_filter {patterns} matches none of {sorted(metas)}")
    return kept


def act_tokens(meta: LayerMeta, act: jax.Array,
               append_ones: bool = False,
               extra_stride: int = 1,
               offset=(0, 0)) -> jax.Array:
    """Layer input -> [N_tokens, fan_in(+1)] activation matrix.

    Conv inputs are expanded into patches (the reference's ``F.unfold``,
    curvatures.py:329-330) via an XLA patch convolution. ``extra_stride``
    multiplies the window stride — spatial token subsampling at zero cost
    (the strided grid never gets generated). ``offset`` shifts the strided
    grid (in output-grid coordinates); the k^2 offset grids of stride k
    partition the full position set, so averaging factors over all offsets
    (weighted by token count) reproduces the full factor exactly — the
    unbiasedness property tests/test_estimators.py checks.
    """
    if meta.kind == "conv":
        if meta.groups > 1:
            raise ValueError(
                f"{meta.name}: grouped conv activations don't flatten to one "
                "[N, fan_in] matrix — use grouped_act_tokens")
        if extra_stride > 1 and offset != (0, 0):
            # offset grids other than (0,0) can't ride the patch-extraction
            # stride; extract the full grid and slice (test/verification
            # path — the fast default remains offset (0,0))
            act = extract_patches(act, meta.kernel_size, meta.strides,
                                  meta.padding)
            act = act[:, offset[0]::extra_stride, offset[1]::extra_stride, :]
        else:
            strides = (meta.strides[0] * extra_stride,
                       meta.strides[1] * extra_stride)
            act = extract_patches(act, meta.kernel_size, strides, meta.padding)
    t = act.reshape(-1, meta.fan_in)
    if append_ones:
        ones = jnp.ones((t.shape[0], 1), t.dtype)
        t = jnp.concatenate([t, ones], axis=1)
    return t


def grouped_act_tokens(meta: LayerMeta, act: jax.Array,
                       append_ones: bool = False,
                       extra_stride: int = 1,
                       offset=(0, 0)) -> jax.Array:
    """Grouped-conv input -> [N_tokens, groups, fan_in(+1)] activations.

    Patch features come out channel-major (c, kh, kw) — see
    ops/patches.extract_patches — so channel block j's features are the
    contiguous slice [j*fan_in, (j+1)*fan_in): one reshape splits the
    group axis out. The appended ones column (bias) is per group, matching
    the [out, fan_in+1] per-group matrix view each output-channel block
    samples against.
    """
    if extra_stride > 1 and offset != (0, 0):
        p = extract_patches(act, meta.kernel_size, meta.strides, meta.padding)
        p = p[:, offset[0]::extra_stride, offset[1]::extra_stride, :]
    else:
        strides = (meta.strides[0] * extra_stride,
                   meta.strides[1] * extra_stride)
        p = extract_patches(act, meta.kernel_size, strides, meta.padding)
    t = p.reshape(-1, meta.groups, meta.fan_in)
    if append_ones:
        ones = jnp.ones(t.shape[:-1] + (1,), t.dtype)
        t = jnp.concatenate([t, ones], axis=-1)
    return t


def grad_tokens(meta: LayerMeta, probe_grad: jax.Array) -> jax.Array:
    """Pre-activation output gradient -> [N_tokens, out]."""
    return probe_grad.reshape(-1, meta.out_features)


def normalize_damping(add, multiply, num_layers: int):
    """Scalar or per-layer damping -> [L] arrays (curvatures.py:361-365)."""
    add = jnp.asarray(add, jnp.float32)
    multiply = jnp.asarray(multiply, jnp.float32)
    if add.ndim == 0:
        add = jnp.broadcast_to(add, (num_layers,))
    if multiply.ndim == 0:
        multiply = jnp.broadcast_to(multiply, (num_layers,))
    if add.shape[0] != num_layers or multiply.shape[0] != num_layers:
        raise ValueError(
            f"per-layer damping needs {num_layers} entries, got "
            f"{add.shape[0]}/{multiply.shape[0]}")
    return add, multiply


class Estimator:
    """Base class for all curvature estimators."""

    #: which capture outputs this estimator consumes; subclasses narrow these
    #: so the unused cotangent path is never computed (see capture.collect).
    need_param_grads = True
    need_probe_grads = True

    @property
    def gram_probe_names(self):
        """Layers whose output-gradient capture runs through the fused
        gram-tap backward (see capture.collect) — estimators that consume
        only the GRAM of the probe gradients override this (KFAC)."""
        return frozenset()

    def __init__(self,
                 model: Model,
                 variables: Dict,
                 layer_types: Optional[Union[str, Sequence[str]]] = None,
                 dtype=jnp.float32,
                 compute_dtype=None,
                 loss: str = "cross_entropy",
                 layer_filter: Optional[Union[str, Sequence[str]]] = None):
        if not model.metas:
            raise ValueError("model.init must run before building an estimator")
        if layer_types is None:
            wanted = {"linear", "conv", "attention"}
        else:
            if isinstance(layer_types, str):
                layer_types = [layer_types]
            wanted = {_TYPE_ALIASES[t] for t in layer_types}
        self.model = model
        self.metas: Dict[str, LayerMeta] = {
            n: m for n, m in model.metas.items() if _meta_type(m) in wanted}
        if not self.metas:
            raise ValueError("no tracked layers match the requested types")
        # name-based subnetwork restriction (last-layer Laplace etc.) —
        # narrows capture too: probe cotangents are only built for tracked
        # layers, so a last-layer fit never backprops factor probes through
        # the trunk
        self.metas = filter_metas(self.metas, layer_filter)
        self.dtype = dtype
        # Optional lower-precision forward/backward (e.g. jnp.bfloat16 for
        # the MXU); factor accumulation always stays in ``dtype``.
        self.compute_dtype = compute_dtype
        # 'cross_entropy' (classification) or 'gaussian' (regression) —
        # selects the Fisher's output distribution (the reference only
        # implements the classification path, scripts/factors.py:39).
        self.loss = loss
        # MAP mean snapshot — the reference's deep-copied model_state
        # (curvatures.py:49); jax arrays are immutable so a reference suffices.
        self.mean_params = variables["params"]
        self.variables = variables
        self.state = self.init_state()
        self.inv_state = None
        # multi-chip: set by use_mesh(); None = single-device execution
        self.mesh = None
        self._data_axis_size = 1
        # PERF: every jitted transform takes all device arrays as ARGUMENTS.
        # Closing over them would embed them as XLA constants, which this
        # backend re-stages on every call (~15x slowdown measured).
        self._jit_update = jax.jit(self._step)
        self._jit_update_rng = jax.jit(self._step_rng, static_argnums=4)
        self._jit_invert = jax.jit(self.invert_state)
        self._jit_sample = jax.jit(self.sample_state)
        self._jit_apply = jax.jit(
            lambda mean, deltas: apply_matrix_delta(self.metas, mean, deltas))
        self._jit_ensemble = jax.jit(self._ensemble, static_argnums=3)
        self._jit_update_scan = jax.jit(self._scan_steps, static_argnums=4,
                                        donate_argnums=0)

    def use_mesh(self, mesh, data_axis: str = "data",
                 sample_axis: Optional[str] = "auto",
                 model_axis: Optional[str] = "auto",
                 tensor_axis: Optional[str] = "auto",
                 seq_axis: Optional[str] = "auto",
                 expert_axis: Optional[str] = "auto",
                 tensor_min_out: int = 128):
        """Route factor updates over a ``jax.sharding.Mesh``.

        Axes (each optional except ``data``; ``"auto"`` enables an axis iff
        the mesh has one with that canonical name):

          * ``data_axis`` — batch sharding (dp). Factor sums are sums over
            tokens, so per-shard moments combine with one psum over ICI —
            mathematically exact. Supersedes the reference's ``--parallel``
            DataParallel wrap (reference utils.py:369).
          * ``sample_axis`` — Monte-Carlo Fisher label draws fan out over the
            mesh (sp) instead of replicating.
          * ``model_axis`` — depth sharding of :class:`~curvature_tpu.nn.scan.
            ScanBlocks` stacks (the pipeline-parallel analogue for curvature):
            stacked ``[depth, ...]`` parameters AND factor state shard over
            this axis, so each device holds the blocks — and the factors,
            eigendecompositions, and posterior draws — of its own stage.
            Invert/sample are vmapped over depth, so the sharded state makes
            them embarrassingly parallel with zero collectives.
          * ``seq_axis`` — sequence parallelism (sp): the token dim of
            ``[B, T]`` LM inputs (or the leading spatial dim of image
            inputs — GSPMD inserts the conv halo exchanges) shards over
            this axis; factor sums are sums over tokens, so per-shard
            token moments combine exactly. For ``loss='lm'`` the
            ``[S, B, T]`` labels/MC draws shard their token dim too.
          * ``expert_axis`` — expert parallelism (ep): :class:`~curvature_tpu.
            nn.layers.MoE` layers shard their ``[E, ...]`` expert params AND
            per-expert factor state over this axis — each device owns its
            experts' weights, factors, and posterior draws.
          * ``tensor_axis`` — Megatron-style column parallelism (tp): kernels
            and biases of wide Dense layers (``out_features`` divisible by the
            axis and ``>= tensor_min_out``) shard over their output-feature
            dim, and each estimator shards the matching dim of its factor
            state (:meth:`_state_leaf_spec`). GSPMD inserts the collectives;
            the math is unchanged.

        All six compose (e.g. ``model:2,tensor:2,data:2`` on 8 chips).
        Batches whose axis sizes don't divide the mesh fall back to the
        single-program wrappers automatically (ragged tail batches).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        # remembered so _pallas_fallback can rebuild the sharded wrappers
        # after a retrace (use_mesh is idempotent)
        self._use_mesh_args = dict(
            data_axis=data_axis, sample_axis=sample_axis,
            model_axis=model_axis, tensor_axis=tensor_axis,
            seq_axis=seq_axis, expert_axis=expert_axis,
            tensor_min_out=tensor_min_out)

        def resolve(axis, canonical):
            if axis == "auto":
                return canonical if canonical in mesh.shape else None
            if axis is not None and axis not in mesh.shape:
                raise ValueError(f"mesh {dict(mesh.shape)} has no axis "
                                 f"{axis!r}")
            return axis

        if data_axis not in mesh.shape:
            raise ValueError(f"mesh {dict(mesh.shape)} has no axis "
                             f"{data_axis!r}")
        sample_axis = resolve(sample_axis, "sample")
        model_axis = resolve(model_axis, "model")
        tensor_axis = resolve(tensor_axis, "tensor")
        seq_axis = resolve(seq_axis, "seq")
        expert_axis = resolve(expert_axis, "expert")
        unused = set(mesh.shape) - {data_axis, sample_axis, model_axis,
                                    tensor_axis, seq_axis, expert_axis}
        if unused:
            # an axis nothing shards over silently idles 1/size of the
            # slice — almost always a typo in a --mesh spec
            raise ValueError(
                f"mesh axes {sorted(unused)} are not used by any sharding "
                "rule; canonical names are data/sample/model/tensor/seq/"
                "expert (or pass the axis explicitly to use_mesh)")
        rep = NamedSharding(mesh, P())
        x_spec = (data_axis, seq_axis) if seq_axis else (data_axis,)
        x_sh = NamedSharding(mesh, P(*x_spec))
        lbl_spec = (sample_axis, data_axis) + (
            (seq_axis,) if seq_axis and self.loss == "lm" else ())
        lbl_sh = NamedSharding(mesh, P(*lbl_spec))
        xs_sh = NamedSharding(mesh, P(None, *x_spec))
        self.mesh = mesh
        self._data_axis_size = mesh.shape[data_axis]
        self._sample_axis_size = (mesh.shape[sample_axis]
                                  if sample_axis else 1)
        self._seq_axis_size = mesh.shape[seq_axis] if seq_axis else 1
        ax = {"model": model_axis,
              "model_size": mesh.shape[model_axis] if model_axis else 1,
              "tensor": tensor_axis,
              "tensor_size": mesh.shape[tensor_axis] if tensor_axis else 1,
              "expert": expert_axis,
              "expert_size": mesh.shape[expert_axis] if expert_axis else 1,
              "tp": (self._tp_layer_names(mesh.shape[tensor_axis],
                                          tensor_min_out)
                     if tensor_axis else frozenset())}
        self._mesh_axes = ax
        if model_axis or tensor_axis or expert_axis:
            state_sh = self._carry_shardings(mesh, ax)
            var_sh = self._variable_shardings(mesh, ax)
        else:
            state_sh = var_sh = rep
        # internally-drawn MC labels get this sharding hint so a 2-D mesh
        # fans the sample axis out (and, for LM losses, the token axis)
        # instead of replicating it
        self._mesh_label_sharding = (
            lbl_sh if sample_axis or len(lbl_spec) > 2 else None)
        self._jit_update_sharded = jax.jit(
            self._step, in_shardings=(state_sh, var_sh, x_sh, lbl_sh),
            out_shardings=state_sh)
        self._jit_update_rng_sharded = jax.jit(
            self._step_rng_meshed, static_argnums=4,
            in_shardings=(state_sh, var_sh, x_sh, rep),
            out_shardings=state_sh)
        self._jit_update_scan_sharded = jax.jit(
            self._scan_steps_meshed, static_argnums=4, donate_argnums=0,
            in_shardings=(state_sh, var_sh, xs_sh, rep),
            out_shardings=state_sh)
        if seq_axis:
            # ragged token dims should only drop the SEQ sharding, not all
            # parallelism: these wrappers keep every other axis live
            x_ns = NamedSharding(mesh, P(data_axis))
            lbl_ns = NamedSharding(mesh, P(sample_axis, data_axis))
            self._jit_update_sharded_noseq = jax.jit(
                self._step, in_shardings=(state_sh, var_sh, x_ns, lbl_ns),
                out_shardings=state_sh)
            self._jit_update_rng_sharded_noseq = jax.jit(
                self._step_rng_meshed, static_argnums=4,
                in_shardings=(state_sh, var_sh, x_ns, rep),
                out_shardings=state_sh)
            self._jit_update_scan_sharded_noseq = jax.jit(
                self._scan_steps_meshed, static_argnums=4, donate_argnums=0,
                in_shardings=(state_sh, var_sh,
                              NamedSharding(mesh, P(None, data_axis)), rep),
                out_shardings=state_sh)
        return self

    # -- model/tensor-axis sharding rules ---------------------------------
    def _tp_ok(self, name: str, meta: LayerMeta) -> bool:
        """Whether a layer is eligible for column (tensor) parallelism.
        Estimators with factor layouts that cannot shard on the
        output-feature dim override this."""
        return meta.kind == "dense" and getattr(meta, "groups", 1) == 1

    def _tp_layer_names(self, axis_size: int, min_out: int):
        return frozenset(
            n for n, m in self.metas.items()
            if self._tp_ok(n, m) and m.out_features % axis_size == 0
            and m.out_features >= min_out)

    def _state_leaf_spec(self, name: str, keys, shape, ax) -> list:
        """PartitionSpec (as a mutable list) for one factor-state leaf of
        layer ``name``; ``keys`` are the dict keys below the layer level.
        Base rule: shard the leading stack axis — ScanBlocks depth over the
        model axis, MoE experts over the expert axis. Estimators extend
        with tensor-parallel dims."""
        m = self.metas.get(name)
        spec = [None] * len(shape)
        if m is not None and m.stacked and shape and shape[0] == m.stacked:
            lead, size = ((ax["expert"], ax["expert_size"])
                          if getattr(m, "moe", False)
                          else (ax["model"], ax["model_size"]))
            if lead and shape[0] % size == 0:
                spec[0] = lead
        return spec

    def _carry_shardings(self, mesh, ax):
        """Shardings pytree matching :meth:`_carry` structure."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax.tree_util import DictKey, tree_map_with_path

        def leaf_sh(path, leaf):
            name, keys = None, []
            for k in path:
                if isinstance(k, DictKey):
                    if name is None and k.key in self.metas:
                        name = k.key
                    elif name is not None:
                        keys.append(k.key)
            if name is None:
                return NamedSharding(mesh, P())
            shape = tuple(getattr(leaf, "shape", ()))
            spec = self._state_leaf_spec(name, tuple(keys), shape, ax)
            return NamedSharding(mesh, P(*spec))

        return tree_map_with_path(leaf_sh, self._carry())

    def _variable_shardings(self, mesh, ax):
        """Shardings pytree matching ``self.variables``: depth-shard stacked
        scan params/stats over the model axis (tracked layers via their
        metas; untracked block-internal layers via the model's recorded
        ``scan_groups``), column-shard eligible Dense kernels/biases over
        the tensor axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax.tree_util import DictKey

        # leading-axis stacks: {layer: (stack_size, mesh_axis, axis_size)}
        stack_map = {}
        for n, m in self.metas.items():
            if m.stacked:
                stack_map[n] = ((m.stacked, ax["expert"], ax["expert_size"])
                                if getattr(m, "moe", False)
                                else (m.stacked, ax["model"],
                                      ax["model_size"]))
        for g in getattr(self.model, "scan_groups", {}).values():
            for layer in (list(g.get("param_layers", []))
                          + list(g.get("stat_layers", []))):
                stack_map.setdefault(
                    layer, (g["depth"], ax["model"], ax["model_size"]))

        def leaf_sh(path, leaf):
            layer = (path[1].key if len(path) >= 2
                     and isinstance(path[1], DictKey) else None)
            pkey = path[-1].key if isinstance(path[-1], DictKey) else None
            shape = tuple(getattr(leaf, "shape", ()))
            spec = [None] * len(shape)
            stack = stack_map.get(layer)
            if (stack is not None and stack[1] and shape
                    and shape[0] == stack[0] and shape[0] % stack[2] == 0):
                spec[0] = stack[1]
            if (ax["tensor"] and layer in ax["tp"]
                    and pkey in ("kernel", "bias") and shape
                    and spec[-1] is None
                    and shape[-1] % ax["tensor_size"] == 0):
                spec[-1] = ax["tensor"]
            return NamedSharding(mesh, P(*spec))

        return jax.tree_util.tree_map_with_path(leaf_sh, self.variables)

    def _dispatch(self, attr: str, batch: int, mc: Optional[int] = None,
                  tokens: Optional[int] = None):
        """Sharded wrapper when the axes divide the mesh; a ragged token
        dim drops only the seq sharding, everything else falls back to the
        single-program path (ragged tail batches)."""
        if self.mesh is not None and batch % self._data_axis_size == 0 \
                and (mc is None or mc % self._sample_axis_size == 0):
            if (self._seq_axis_size == 1
                    or (tokens is not None
                        and tokens % self._seq_axis_size == 0)):
                return getattr(self, attr + "_sharded")
            return getattr(self, attr + "_sharded_noseq")
        return getattr(self, attr)

    # -- pure transforms (override per estimator) ---------------------------
    def init_state(self):
        raise NotImplementedError

    def update_state(self, state, cap: Captured):
        raise NotImplementedError

    def invert_state(self, state, add, multiply):
        raise NotImplementedError

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        """Draw one posterior offset per layer: {name: [out, fan_in+1]}."""
        raise NotImplementedError

    def logdet_state(self, state, add, multiply):
        """``log det`` of the damped posterior PRECISION the sampler uses
        (scalar over all tracked layers). Pure; used by the Laplace
        marginal likelihood (eval/marglik.py). Extension beyond the
        reference."""
        raise NotImplementedError

    def logdet_precision(self, add=0.0, multiply=1.0) -> float:
        """Stateful convenience wrapper over :meth:`logdet_state`."""
        assert self.state, \
            "State is empty. Did you call 'update' prior to this?"
        add, multiply = normalize_damping(add, multiply, len(self.metas))
        if not hasattr(self, "_jit_logdet"):
            self._jit_logdet = jax.jit(self.logdet_state)
        return float(self._jit_logdet(self.state, add, multiply))

    def quad_state(self, state, add, multiply, deltas):
        """delta^T P delta for matrix-view offsets ``deltas`` under the
        damped precision P (scalar over tracked layers). Pure; with
        :meth:`logdet_state` it completes the Gaussian API — sampling,
        normalization, and density evaluation. The quadratic form is also
        the EWC penalty of continual learning (Kirkpatrick et al., 2017)."""
        raise NotImplementedError

    def solve_state(self, inv_state, deltas):
        """``P^{-1} @ deltas`` (matrix view) with the SAME damped precision
        the sampler draws from — every sampler here is an explicit linear
        square root ``A`` with ``A A^T = P^{-1}``, so the solve is exact,
        never iterative. Pure; see :meth:`precision_solve`. Inverse-vector
        products power influence functions (Koh & Liang, 2017) and
        natural-gradient steps; the reference has no inverse application
        at all (its inverses exist only inside sampling,
        curvatures.py:104-129)."""
        raise NotImplementedError

    def precision_solve(self, deltas, add=0.0, multiply=1.0):
        """Stateful convenience wrapper over :meth:`solve_state`: damped
        invert at (add, multiply), then apply ``P^{-1}`` to the matrix-view
        offsets ``deltas``."""
        assert self.state, \
            "State is empty. Did you call 'update' prior to this?"
        add, multiply = normalize_damping(add, multiply, len(self.metas))
        inv = self._wrap_inv(self._jit_invert(self.state, add, multiply))
        if not hasattr(self, "_jit_solve"):
            self._jit_solve = jax.jit(self.solve_state)
        return self._jit_solve(inv, deltas)

    def quadratic_form(self, deltas, add=0.0, multiply=1.0) -> float:
        assert self.state, \
            "State is empty. Did you call 'update' prior to this?"
        add, multiply = normalize_damping(add, multiply, len(self.metas))
        if not hasattr(self, "_jit_quad"):
            self._jit_quad = jax.jit(self.quad_state)
        return float(self._jit_quad(self.state, add, multiply, deltas))

    def log_density(self, params, add=0.0, multiply=1.0) -> float:
        """Log-density of the Laplace posterior N(theta*, P^-1) at a full
        ``params`` pytree (untracked leaves are ignored — subnetwork
        semantics). Useful for importance weighting and posterior
        diagnostics; the reference has no density evaluation at all."""
        from curvature_tpu.nn.core import param_matrix
        deltas, d = {}, 0
        for name, meta in self.metas.items():
            delta = param_matrix(meta, params[name]) \
                - param_matrix(meta, self.mean_params[name])
            deltas[name] = delta
            d += delta.size
        q = self.quadratic_form(deltas, add, multiply)
        logdet = self.logdet_precision(add, multiply)
        return -0.5 * (q + d * jnp.log(2 * jnp.pi).item()) + 0.5 * logdet

    # -- capture plumbing ----------------------------------------------------
    def _cast_compute(self, variables, x):
        if self.compute_dtype is None:
            return variables, x
        from curvature_tpu.utils.casting import cast_floats, cast_input
        return ({"params": cast_floats(variables["params"],
                                       self.compute_dtype),
                 "batch_stats": variables.get("batch_stats", {})},
                cast_input(x, self.compute_dtype))

    def _step(self, state, variables, x, labels):
        variables, x = self._cast_compute(variables, x)
        cap = collect(self.model, self.metas, variables, x, labels=labels,
                      train=True,
                      need_param_grads=self.need_param_grads,
                      need_probe_grads=self.need_probe_grads,
                      loss=self.loss,
                      gram_probe_names=self.gram_probe_names)
        return self.update_state(state, cap)

    def _step_rng(self, state, variables, x, rng, num_samples):
        variables, x = self._cast_compute(variables, x)
        cap = collect(self.model, self.metas, variables, x, rng=rng,
                      num_samples=num_samples, train=True,
                      need_param_grads=self.need_param_grads,
                      need_probe_grads=self.need_probe_grads,
                      loss=self.loss,
                      gram_probe_names=self.gram_probe_names)
        return self.update_state(state, cap)

    def _scan_steps(self, state, variables, xs, rngs, num_samples):
        """Fold many batches into one compiled program via lax.scan —
        amortizes per-dispatch overhead (a large win for small models on
        remote backends)."""
        def body(st, inp):
            x, rng = inp
            return self._step_rng(st, variables, x, rng, num_samples), None
        state, _ = jax.lax.scan(body, state, (xs, rngs))
        return state

    # -- mesh variants: constrain the drawn MC labels so GSPMD shards the
    # -- sample axis (2-D meshes); identical math otherwise --------------
    def _step_rng_meshed(self, state, variables, x, rng, num_samples):
        variables, x = self._cast_compute(variables, x)
        cap = collect(self.model, self.metas, variables, x, rng=rng,
                      num_samples=num_samples, train=True,
                      need_param_grads=self.need_param_grads,
                      need_probe_grads=self.need_probe_grads,
                      loss=self.loss,
                      label_sharding=self._mesh_label_sharding,
                      gram_probe_names=self.gram_probe_names)
        return self.update_state(state, cap)

    def _scan_steps_meshed(self, state, variables, xs, rngs, num_samples):
        def body(st, inp):
            x, rng = inp
            return (self._step_rng_meshed(st, variables, x, rng,
                                          num_samples), None)
        state, _ = jax.lax.scan(body, state, (xs, rngs))
        return state

    # -- update-carry hooks (EFB carries extra pytrees) ----------------------
    def _carry(self):
        return self.state

    def _set_carry(self, carry):
        self.state = carry

    # -- Pallas compile-failure fallback ------------------------------------
    # Markers of a TPU kernel compile/resource failure attributable to the
    # custom Pallas kernels. The concrete instance that motivated this:
    # inside a LARGE fused program (ResNet-50 factor update at batch 32)
    # XLA's co-scheduling around the patch-Gram custom call can exceed the
    # 16 MB scoped-vmem limit even though the identical kernel compiles
    # standalone and at batch 16 — an emergent property of the surrounding
    # program that no per-shape gate can predict. The XLA Gram paths are
    # exact equivalents, so the correct behavior is retrace-without-Pallas,
    # not a crash. Markers are kept narrow ('vmem' is the scoped-vmem
    # overflow class, 'mosaic' is the Pallas compiler) so generic backend/
    # HBM-OOM errors don't silently disable Pallas for the estimator's
    # lifetime.
    _PALLAS_ERR_MARKERS = ("vmem", "mosaic")

    def _pallas_fallback(self, err) -> bool:
        """If ``err`` looks like a Pallas kernel compile/resource failure
        and this estimator has Pallas kernels enabled, disable them,
        rebuild the jitted update wrappers, and return True (retry)."""
        if not getattr(self, "use_pallas", False):
            return False
        msg = str(err).lower()
        if not any(m in msg for m in self._PALLAS_ERR_MARKERS):
            return False
        import warnings
        warnings.warn(
            "Pallas kernel failed to compile inside the fused update "
            f"program ({str(err)[:200]}...); retracing with use_pallas="
            "False — the XLA Gram paths are exact equivalents.",
            RuntimeWarning)
        self.use_pallas = False
        # jax.jit on the SAME bound method returns the STALE trace (the
        # trace cache keys on the callable, and bound methods of one
        # instance compare equal) — the retry would resubmit the exact
        # jaxpr that just failed. Shadow the step methods with fresh
        # instance-level closures so every jit below genuinely retraces
        # and re-reads use_pallas.
        cls = type(self)
        for name in ("_step", "_step_rng", "_scan_steps",
                     "_step_rng_meshed", "_scan_steps_meshed"):
            if hasattr(cls, name):
                setattr(self, name,
                        (lambda m: lambda *a, **k: m(self, *a, **k))(
                            getattr(cls, name)))
        self._jit_update = jax.jit(self._step)
        self._jit_update_rng = jax.jit(self._step_rng, static_argnums=4)
        self._jit_update_scan = jax.jit(self._scan_steps, static_argnums=4,
                                        donate_argnums=0)
        if self.mesh is not None and getattr(self, "_use_mesh_args", None):
            self.use_mesh(self.mesh, **self._use_mesh_args)
        return True

    # -- stateful convenience API (reference lifecycle) ----------------------
    def update_batches(self, xs, rng, num_samples: int = 1):
        """Accumulate factors from a stacked batch axis: xs [T, B, ...] runs
        T update steps inside one jitted scan."""
        xs = jnp.asarray(xs)
        rngs = jax.random.split(rng, xs.shape[0])
        tokens = xs.shape[2] if xs.ndim >= 3 else None
        try:
            fn = self._dispatch("_jit_update_scan", xs.shape[1],
                                tokens=tokens)
            self._set_carry(fn(self._carry(), self.variables, xs, rngs,
                               num_samples))
        except Exception as e:                       # noqa: BLE001
            # the scan wrapper DONATES its carry: a matched error that
            # fired after execution started (runtime Mosaic fault rather
            # than a compile failure) may have consumed the buffers — a
            # retry would dispatch deleted arrays, so re-raise instead
            carry_dead = any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree_util.tree_leaves(self._carry()))
            if carry_dead or not self._pallas_fallback(e):
                raise
            fn = self._dispatch("_jit_update_scan", xs.shape[1],
                                tokens=tokens)
            self._set_carry(fn(self._carry(), self.variables, xs, rngs,
                               num_samples))
        return self.state

    def update(self, x, labels=None, rng=None, num_samples: int = 1):
        """Accumulate factors from one batch.

        ``labels=None`` draws ``num_samples`` Monte-Carlo labels from the
        model distribution (true Fisher, scripts/factors.py:52-61); explicit
        labels ([B] or [S, B]) give the empirical Fisher.
        """
        tokens = x.shape[1] if getattr(x, "ndim", 1) >= 2 else None
        if labels is None:
            def attempt():
                fn = self._dispatch("_jit_update_rng", x.shape[0],
                                    tokens=tokens)
                self._set_carry(fn(self._carry(), self.variables, x, rng,
                                   num_samples))
        else:
            labels = jnp.asarray(labels)
            # normalize to the [S, B(, D)] form collect would produce, so
            # the sharded wrapper's P(sample, data) spec lands on the right
            # axes (gaussian-loss labels carry a trailing feature dim)
            min_ndim = 2 if self.loss in ("gaussian", "lm") else 1
            if labels.ndim == min_ndim:
                labels = labels[None]

            def attempt():
                fn = self._dispatch("_jit_update", x.shape[0],
                                    labels.shape[0], tokens=tokens)
                self._set_carry(fn(self._carry(), self.variables, x, labels))
        try:
            attempt()
        except Exception as e:                       # noqa: BLE001
            if not self._pallas_fallback(e):
                raise
            attempt()
        return self.state

    def _inv_aux(self):
        """Auxiliary arrays `_wrap_inv` attaches to the sampling state (EFB:
        its Kronecker eigenvectors; None for everything else). Exposed
        separately so jitted callers can pass them as jit ARGUMENTS —
        closure-captured device arrays become embedded program constants,
        which bloats the HLO enough to overflow this deployment's
        remote-compile request limit for ResNet-size eigvecs (HTTP 413)."""
        return None

    def _wrap_inv_aux(self, inv, aux):
        """Pure form of `_wrap_inv`: combine invert output with `_inv_aux`
        arrays. Safe to call inside jit with `aux` as an argument."""
        return inv

    def _wrap_inv(self, inv):
        """Post-process the pure invert output into the sampling state
        (identity for most estimators; EFB attaches its eigvecs)."""
        return self._wrap_inv_aux(inv, self._inv_aux())

    def invert(self, add=0.0, multiply=1.0):
        """Damped inversion; ``add``/``multiply`` may be scalars or per-layer
        sequences (curvatures.py:90-102)."""
        assert self.state, \
            "State is empty. Did you call 'update' prior to this?"
        add, multiply = normalize_damping(add, multiply, len(self.metas))
        self.inv_state = self._wrap_inv(
            self._jit_invert(self.state, add, multiply))
        return self.inv_state

    def sample(self, rng) -> Dict[str, jax.Array]:
        assert self.inv_state is not None, \
            "Inverse state is empty. Did you call 'invert' prior to this?"
        return self._jit_sample(self.inv_state, rng)

    def posterior_params(self, rng) -> Dict:
        """MAP params + one posterior sample (reference sample_and_replace,
        curvatures.py:117-129) — returns a new pytree."""
        deltas = self.sample(rng)
        return self._jit_apply(self.mean_params, deltas)

    def _ensemble(self, inv_state, mean_params, rng, num_samples):
        rngs = jax.random.split(rng, num_samples)
        deltas = jax.vmap(lambda r: self.sample_state(inv_state, r))(rngs)
        return jax.vmap(
            lambda d: apply_matrix_delta(self.metas, mean_params, d))(deltas)

    def ensemble_params(self, rng, num_samples: int) -> Dict:
        """[S, ...]-stacked posterior parameter pytree for vmapped eval."""
        assert self.inv_state is not None, \
            "Inverse state is empty. Did you call 'invert' prior to this?"
        return self._jit_ensemble(self.inv_state, self.mean_params, rng,
                                  num_samples)

    # -- damping helpers ------------------------------------------------------
    def _per_layer(self, add, multiply):
        """Yield (index, name, meta, n, s) in state order."""
        for i, (name, meta) in enumerate(self.metas.items()):
            yield i, name, meta, add[i], multiply[i]
