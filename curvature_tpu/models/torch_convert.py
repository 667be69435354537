"""Convert PyTorch checkpoints into curvature_tpu variables.

The reference leans on pretrained torch weights everywhere (bundled
curvature/lenet5_mnist.pth, torchvision zoo models, user-trained ResNets —
factors.py:74-84). This module converts torch state dicts mechanically:

  * Conv ``weight`` OIHW -> HWIO
  * Linear ``weight`` [out, in] -> [in, out]
  * BatchNorm ``weight``/``bias``/``running_mean``/``running_var`` ->
    params.scale/params.bias + batch_stats.mean/var

torch is only used on the host to read the file; all arrays land in numpy and
feed device-side pytrees.
"""
from typing import Dict, Optional

import numpy as np


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def convert_torch_state_dict(state_dict: Dict,
                             key_map: Optional[Dict[str, str]] = None) -> Dict:
    """Convert a torch state dict to ``{'params':..., 'batch_stats':...}``.

    Args:
      state_dict: torch module state dict (tensors or numpy arrays).
      key_map: optional map of torch layer-path prefixes to our layer names
        (e.g. lenet5.TORCH_KEY_MAP). Identity when None (torchvision-style
        names already match, as in models.resnet).
    """
    params: Dict[str, Dict[str, np.ndarray]] = {}
    stats: Dict[str, Dict[str, np.ndarray]] = {}
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        layer, _, pname = key.rpartition(".")
        if key_map is not None:
            layer = key_map.get(layer, layer)
        groups.setdefault(layer, {})[pname] = _to_numpy(val)

    # torch MultiheadAttention packs qkv as `<attn>.in_proj_weight` and a
    # submodule `<attn>.out_proj`; our SelfAttention tracks them as the
    # Dense pseudo-layers `<attn>/in_proj` and `<attn>/out_proj`
    # (nn/layers.py SelfAttention, the reference's attn_in/attn_out split,
    # curvatures.py:125-129)
    attn_parents = {layer for layer, g in groups.items()
                    if "in_proj_weight" in g}
    for layer, g in list(groups.items()):
        if layer.endswith(".out_proj") and layer[:-9] in attn_parents:
            groups[layer[:-9] + "/out_proj"] = groups.pop(layer)

    for layer, g in groups.items():
        if "running_mean" in g:  # BatchNorm
            params[layer] = {"scale": g["weight"], "bias": g["bias"]}
            stats[layer] = {"mean": g["running_mean"], "var": g["running_var"]}
            continue
        if "in_proj_weight" in g:  # packed attention qkv projection
            if "in_proj_bias" not in g:
                raise ValueError(
                    f"{layer}: bias-free MultiheadAttention is not "
                    "supported by the conversion (our in_proj Dense "
                    "expects a bias)")
            params[layer + "/in_proj"] = {
                "kernel": np.ascontiguousarray(g["in_proj_weight"].T),
                "bias": g["in_proj_bias"],
            }
            continue
        if "weight" not in g:
            # unpacked attention projections (q/k/v_proj_weight, emitted by
            # torch when kdim/vdim differ) must fail loudly, not become
            # orphan raw-param groups that surface as KeyErrors in apply
            unpacked = {"q_proj_weight", "k_proj_weight", "v_proj_weight",
                        "bias_k", "bias_v"}
            if unpacked & set(g):
                raise ValueError(
                    f"{layer}: unpacked attention projections "
                    f"({sorted(unpacked & set(g))}) are not supported — "
                    "only the packed in_proj_weight layout converts")
            # raw tensors (ViT class_token, encoder.pos_embedding, embedding
            # tables): each becomes its own {"value": ...} param group
            for pname, val in g.items():
                name = f"{layer}.{pname}" if layer else pname
                params[name] = {"value": val}
            continue
        w = g["weight"]
        if w.ndim == 4:          # Conv OIHW -> HWIO
            kernel = np.transpose(w, (2, 3, 1, 0))
        elif w.ndim == 2:        # Linear [out, in] -> [in, out]
            kernel = w.T
        elif w.ndim == 1:        # LayerNorm weight/bias
            if "bias" not in g:
                raise ValueError(
                    f"{layer}: bias-free LayerNorm is not supported by "
                    "the conversion (our LayerNorm expects scale+bias)")
            lname = layer.rsplit(".", 1)[-1].lower()
            if "bn" in lname or "batchnorm" in lname:
                # a BatchNorm saved with track_running_stats=False has no
                # running_mean/var group and would silently convert as
                # LayerNorm — then fail (or be mis-applied) because no
                # batch_stats entry exists for the target layer
                import warnings
                warnings.warn(
                    f"{layer}: 1-D weight without running stats converts as "
                    "LayerNorm scale/bias; if the target layer is a "
                    "BatchNorm (track_running_stats=False checkpoint), no "
                    "batch_stats entry is created and apply will fail")
            params[layer] = {"scale": w, "bias": g["bias"]}
            continue
        else:
            raise ValueError(f"unsupported weight rank for {layer}: {w.shape}")
        entry = {"kernel": np.ascontiguousarray(kernel)}
        if "bias" in g:
            entry["bias"] = g["bias"]
        params[layer] = entry
    return {"params": params, "batch_stats": stats}


def stack_scan_groups(variables: Dict, model) -> Dict:
    """Fold per-depth converted params into a ScanBlocks model's stacked
    ``[depth, ...]`` layout.

    torchvision checkpoints name each transformer block separately
    (``encoder.layers.encoder_layer_{i}.*``); a depth-scanned model
    (nn/scan.py) stores one stacked tensor per template layer. The model's
    ``scan_groups`` (recorded at init) supplies the per-depth name prefixes.
    Idempotent: groups whose stacked entries are already present (e.g. an
    npz saved from a scan model) pass through untouched.
    """
    groups = getattr(model, "scan_groups", {})
    if not groups:
        return variables
    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    for prefix, info in groups.items():
        per = info.get("per_depth_names")
        for tree, layers in ((params, info["param_layers"]),
                             (stats, info["stat_layers"])):
            for layer in layers:
                if layer in tree:
                    continue                    # already stacked
                if per is None:
                    raise ValueError(
                        f"scan group {prefix!r} has no per_depth_names; "
                        f"cannot gather {layer!r} from an unstacked "
                        "checkpoint")
                rest = layer[len(prefix):]
                names = [pd + rest for pd in per]
                missing = [n for n in names if n not in tree]
                if missing:
                    raise ValueError(
                        f"checkpoint is missing per-depth entries for "
                        f"{layer!r}: {missing[:3]}{'...' if len(missing) > 3 else ''}")
                keys = tree[names[0]].keys()
                tree[layer] = {
                    k: np.stack([np.asarray(tree[n][k]) for n in names])
                    for k in keys}
                for n in names:
                    del tree[n]
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str,
                          key_map: Optional[Dict[str, str]] = None) -> Dict:
    """Load a ``.pth`` file (host-side torch) and convert."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return convert_torch_state_dict(state, key_map)


def export_torch_state_dict(variables: Dict,
                            key_map: Optional[Dict[str, str]] = None) -> Dict:
    """Inverse of :func:`convert_torch_state_dict`: our variables pytree
    back to a torch-layout state dict (numpy arrays; pass through
    ``torch.from_numpy`` or save with ``torch.save`` as-is).

    ``key_map`` maps OUR layer names back to torch layer-path prefixes —
    pass the inverse of the map used at conversion time (e.g.
    ``{v: k for k, v in lenet5.TORCH_KEY_MAP.items()}``) when the
    checkpoint was converted with one; torchvision-named models need none.

    Closes the migration loop in the other direction — a model tuned or
    SWA-averaged here can be re-exported for any torch-side tooling the
    reference ecosystem uses. Layout inversions mirror the forward
    direction: HWIO -> OIHW, [in, out] -> [out, in], scale/bias + stats ->
    BN weight/bias/running_mean/running_var (+ a zero
    ``num_batches_tracked``), ``{"value"}`` raw params keep their full
    dotted torch key, and the ``<attn>/in_proj``/``/out_proj``
    pseudo-layers re-pack as ``in_proj_weight``/``in_proj_bias`` and the
    ``out_proj`` submodule. Stacked (ScanBlocks) variables must be
    per-depth (i.e. the layout torch checkpoints use); exporting a stacked
    tree raises.
    """
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    if key_map is not None:
        params = {key_map.get(n, n): e for n, e in params.items()}
        stats = {key_map.get(n, n): e for n, e in stats.items()}
    out: Dict[str, np.ndarray] = {}

    def _np(v):
        return np.ascontiguousarray(np.asarray(v, dtype=np.float32))

    for layer, entry in params.items():
        if layer in stats:  # BatchNorm
            out[f"{layer}.weight"] = _np(entry["scale"])
            out[f"{layer}.bias"] = _np(entry["bias"])
            out[f"{layer}.running_mean"] = _np(stats[layer]["mean"])
            out[f"{layer}.running_var"] = _np(stats[layer]["var"])
            out[f"{layer}.num_batches_tracked"] = np.asarray(0, np.int64)
            continue
        if "value" in entry:  # raw tensor: the name IS the torch key
            out[layer] = _np(entry["value"])
            continue
        if "scale" in entry:  # LayerNorm
            out[f"{layer}.weight"] = _np(entry["scale"])
            out[f"{layer}.bias"] = _np(entry["bias"])
            continue
        kernel = np.asarray(entry["kernel"])
        if kernel.ndim in (3, 5):  # [depth, ...] stacked Dense/Conv
            raise ValueError(
                f"{layer}: cannot export kernel of rank {kernel.ndim} — "
                "stacked (ScanBlocks) variables must be unstacked to the "
                "per-depth torch layout first")
        if layer.endswith("/in_proj"):
            base = layer[: -len("/in_proj")]
            out[f"{base}.in_proj_weight"] = _np(kernel.T)
            out[f"{base}.in_proj_bias"] = _np(entry["bias"])
            continue
        if layer.endswith("/out_proj"):
            base = layer[: -len("/out_proj")] + ".out_proj"
            out[f"{base}.weight"] = _np(kernel.T)
            if "bias" in entry:
                out[f"{base}.bias"] = _np(entry["bias"])
            continue
        if kernel.ndim == 4:       # HWIO -> OIHW
            out[f"{layer}.weight"] = _np(np.transpose(kernel, (3, 2, 0, 1)))
        elif kernel.ndim == 2:     # [in, out] -> [out, in]
            out[f"{layer}.weight"] = _np(kernel.T)
        else:
            raise ValueError(
                f"unsupported kernel rank for {layer}: {kernel.shape}")
        if "bias" in entry:
            out[f"{layer}.bias"] = _np(entry["bias"])
    return out


def unstack_scan_groups(variables: Dict, model) -> Dict:
    """Inverse of :func:`stack_scan_groups`: split a ScanBlocks model's
    stacked ``[depth, ...]`` entries back into per-depth layers, so the
    result feeds :func:`export_torch_state_dict` (torch checkpoints name
    each block separately). Groups without ``per_depth_names`` cannot be
    unstacked and raise; non-scan variables pass through untouched.
    """
    groups = getattr(model, "scan_groups", {})
    if not groups:
        return variables
    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    for prefix, info in groups.items():
        per = info.get("per_depth_names")
        for tree, layers in ((params, info["param_layers"]),
                             (stats, info["stat_layers"])):
            for layer in layers:
                if layer not in tree:
                    continue                    # already per-depth
                if per is None:
                    raise ValueError(
                        f"scan group {prefix!r} has no per_depth_names; "
                        f"cannot scatter {layer!r} back to per-depth "
                        "checkpoint entries")
                rest = layer[len(prefix):]
                stacked = tree.pop(layer)
                for d, pd in enumerate(per):
                    tree[pd + rest] = {
                        k: np.asarray(v)[d] for k, v in stacked.items()}
    return {"params": params, "batch_stats": stats}
