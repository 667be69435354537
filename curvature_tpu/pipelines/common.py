"""Shared model/data construction for the pipeline CLIs.

Mirrors the model/data dispatch every reference script repeats
(factors.py:74-110, evaluate.py:331-345, hyper.py:48-77).
"""
import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu import models
from curvature_tpu.data import loaders as D
from curvature_tpu.data.synthetic import synthetic_images, synthetic_tokens
from curvature_tpu.utils.checkpoint import load_pytree

NUM_CLASSES = {"mnist": 10, "kmnist": 10, "cifar10": 10, "svhn": 10,
               "gtsrb": 43, "tiny": 200, "imagenet": 1000, "synthetic": 10,
               "tokens": 256}


def loss_kind(cfg) -> str:
    """Estimator loss for the dataset: per-token categorical Fisher for
    token streams (``loss='lm'``, estimators/capture.py), classification
    cross-entropy otherwise."""
    return "lm" if cfg.data == "tokens" else "cross_entropy"


def input_shape(data: str, model: str = "") -> Tuple[int, int, int]:
    if data in ("mnist", "kmnist"):
        return (28, 28, 1)
    if data in ("cifar10", "svhn", "gtsrb", "synthetic"):
        return (32, 32, 3)
    if data == "tiny":
        return (64, 64, 3)
    if data == "imagenet":
        # torchvision GoogLeNet is a 224-px model; the reference feeds it
        # 299-px images (factors.py:106-107), a size that belongs to
        # Inception-v3 only. We keep the canonical 224 for googlenet.
        s = 299 if model == "inception_v3" else 224
        return (s, s, 3)
    raise ValueError(f"unknown dataset {data!r}")


def build_model(cfg):
    """Construct the model and its variables; load pretrained weights.

    Weight sources, in order: our npz checkpoint
    ``<root>/weights/<model>_<data>.npz``, a torch ``.pth`` of the same stem
    (converted on the host), or fresh initialization. The bundled reference
    LeNet-5 checkpoint is used automatically for lenet5/mnist when present
    (reference lenet5.py:26-29).
    """
    num_classes = NUM_CLASSES.get(cfg.data, 10)
    if cfg.model.startswith("gpt"):
        # --vocab overrides the dataset default (256) — e.g. 50257 builds
        # the real GPT-2 head, whose KFAC G factor goes blocked
        return _build_lm_model(cfg, getattr(cfg, "vocab", 0) or num_classes)
    key_map = None
    if cfg.model == "lenet5":
        from curvature_tpu.models.lenet5 import TORCH_KEY_MAP
        key_map = TORCH_KEY_MAP
    kw = {}
    if cfg.model.startswith("resnet"):
        # CIFAR-style 3x3 stride-1 stem off ImageNet (reference resnet.py:128-130)
        kw["stem"] = "imagenet" if cfg.data in ("imagenet", "tiny") else "cifar"
    if cfg.model.startswith("vit"):
        # the positional embedding is sized by the patch grid, so the model
        # must be built for the dataset's image size
        kw["image_size"] = input_shape(cfg.data, cfg.model)[0]
        if getattr(cfg, "scan_blocks", False):
            # depth-scanned encoder stack: compile cost O(1) in depth
            kw["scan_blocks"] = True
    if cfg.model.startswith("maxvit"):
        # the partition size must divide every stage grid (input/4 ..
        # input/32); input/32 always does, and equals torchvision's fixed
        # 7 at the canonical 224px (maxvit asserts the same divisibility)
        kw["partition"] = max(1, input_shape(cfg.data, cfg.model)[0] // 32)
    # name -> constructor registry: the analogue of the reference's
    # ``getattr(torchvision.models, args.model)`` (factors.py:80-84)
    model = models.build(cfg.model, num_classes, **kw)

    h, w, c = input_shape(cfg.data, cfg.model)
    sample = jnp.zeros((1, h, w, c), jnp.float32)
    variables = model.init(jax.random.PRNGKey(cfg.seed), sample)

    weights_npz = os.path.join(cfg.root_dir, "weights",
                               f"{cfg.model}_{cfg.data}.npz")
    weights_pth = os.path.join(cfg.root_dir, "weights",
                               f"{cfg.model}_{cfg.data}.pth")
    # checked-in converted checkpoint (reference lenet5.py:26-29 bundles
    # the .pth inside the package the same way) — makes the blitz and the
    # MNIST chain self-sufficient with zero external files
    bundled_npz = os.path.join(os.path.dirname(models.__file__), "assets",
                               f"{cfg.model}_{cfg.data}.npz")
    reference_pth = "/root/reference/curvature/lenet5_mnist.pth"
    loaded = None
    if os.path.exists(weights_npz):
        loaded = load_pytree(weights_npz)
    elif os.path.exists(weights_pth):
        loaded = models.load_torch_checkpoint(weights_pth, key_map)
    elif os.path.exists(bundled_npz):
        loaded = load_pytree(bundled_npz)
    elif cfg.model == "lenet5" and cfg.data == "mnist" \
            and os.path.exists(reference_pth):
        loaded = models.load_torch_checkpoint(reference_pth, key_map)
    if loaded is not None:
        # fold per-depth checkpoint entries into ScanBlocks' stacked layout
        # (no-op for non-scanned models / already-stacked npz checkpoints)
        loaded = models.stack_scan_groups(loaded, model)
        # loud shape validation: a checkpoint trained at a different input
        # size (e.g. a 224-px ViT's (1,197,768) pos embedding against a
        # 32-px build) would otherwise surface as a cryptic broadcast error
        # deep inside model.apply
        init_params = variables["params"]
        for layer, group in loaded.get("params", {}).items():
            for pname, arr in group.items():
                want = init_params.get(layer, {}).get(pname)
                if want is not None and tuple(want.shape) != \
                        tuple(jnp.shape(arr)):
                    raise ValueError(
                        f"checkpoint shape mismatch for {layer}.{pname}: "
                        f"file has {tuple(jnp.shape(arr))}, the model built "
                        f"for {cfg.data} ({h}x{w}) expects "
                        f"{tuple(want.shape)} — was the checkpoint trained "
                        "at a different input size?")
        variables = jax.tree_util.tree_map(jnp.asarray, loaded)
        if "batch_stats" not in variables:
            variables["batch_stats"] = {}
    return model, variables


def _build_lm_model(cfg, vocab: int):
    """Causal-LM branch of :func:`build_model`: integer-token sample input,
    context length from ``--seq_len``, optional depth-scanned blocks."""
    t = int(getattr(cfg, "seq_len", 0) or 64)
    kw = {"max_len": t}
    if getattr(cfg, "scan_blocks", False):
        kw["scan_blocks"] = True
    model = models.build(cfg.model, vocab, **kw)
    sample = jnp.zeros((1, t), jnp.int32)
    variables = model.init(jax.random.PRNGKey(cfg.seed), sample)
    weights_npz = os.path.join(cfg.root_dir, "weights",
                               f"{cfg.model}_{cfg.data}.npz")
    weights_pth = os.path.join(cfg.root_dir, "weights",
                               f"{cfg.model}_{cfg.data}.pth")
    loaded = None
    if os.path.exists(weights_npz):
        loaded = load_pytree(weights_npz)
    elif os.path.exists(weights_pth):
        # a Hugging Face GPT2LMHeadModel/GPT2Model state dict saved with
        # torch.save(model.state_dict(), ...)
        import torch
        sd = torch.load(weights_pth, map_location="cpu")
        loaded = models.convert_gpt2_state_dict(sd)
    if loaded is not None:
        loaded = models.stack_scan_groups(loaded, model)
        init_params = variables["params"]
        for layer, group in loaded.get("params", {}).items():
            for pname, arr in group.items():
                want = init_params.get(layer, {}).get(pname)
                if want is not None and tuple(want.shape) != \
                        tuple(jnp.shape(arr)):
                    if (layer == "wpe"
                            and jnp.shape(arr)[1:] == tuple(want.shape[1:])
                            and jnp.shape(arr)[0] > want.shape[0]):
                        # a converted HF GPT-2 checkpoint carries the full
                        # 1024-row position table; a shorter --seq_len
                        # context uses its prefix (standard practice) —
                        # only genuinely incompatible dims still raise
                        group[pname] = jnp.asarray(arr)[:want.shape[0]]
                        continue
                    raise ValueError(
                        f"checkpoint shape mismatch for {layer}.{pname}: "
                        f"file has {tuple(jnp.shape(arr))}, the model built "
                        f"with --seq_len {t} / vocab {vocab} expects "
                        f"{tuple(want.shape)}")
        variables = jax.tree_util.tree_map(jnp.asarray, loaded)
        if "batch_stats" not in variables:
            variables["batch_stats"] = {}
    return model, variables


def build_data(cfg, splits="train"):
    """Dataset dispatch (reference factors.py:89-110). ``synthetic`` serves
    tests/benchmarks in this download-free environment."""
    root = cfg.data_dir
    if cfg.data == "tokens":
        # synthetic Markov token streams (inputs, next-token labels) — the
        # download-free causal-LM dataset; vocab = NUM_CLASSES['tokens']
        t = int(getattr(cfg, "seq_len", 0) or 64)
        vocab = getattr(cfg, "vocab", 0) or NUM_CLASSES["tokens"]
        # one transition permutation shared by every split; per-split rngs
        # draw disjoint sequences from the same process
        perm = np.random.default_rng(cfg.seed).permutation(vocab)
        split_list = [splits] if isinstance(splits, str) else list(splits)
        out = []
        for s in split_list:
            rng = np.random.default_rng(cfg.seed + {"train": 1, "val": 2,
                                                    "test": 3}.get(s, 4))
            n = 512 if s == "train" else 256
            x, y = synthetic_tokens(rng, n, t, vocab, perm=perm)
            out.append(D.ArrayLoader(x, y, cfg.batch_size,
                                     shuffle=(s == "train")))
        return out[0] if len(out) == 1 else out
    if cfg.data == "synthetic":
        h, w, c = input_shape("synthetic")
        rng = np.random.default_rng(cfg.seed)
        n = 512 if splits == "train" else 256
        x, y = synthetic_images(rng, n, h, w, c, NUM_CLASSES["synthetic"])
        split_list = [splits] if isinstance(splits, str) else list(splits)
        out = [D.ArrayLoader(x, y, cfg.batch_size, shuffle=(s == "train"))
               for s in split_list]
        return out[0] if len(out) == 1 else out
    if cfg.data == "mnist":
        return D.mnist(root, cfg.batch_size, cfg.workers, cfg.augment, splits)
    if cfg.data == "kmnist":
        return D.kmnist(root, cfg.batch_size, cfg.workers, cfg.augment, splits)
    if cfg.data == "cifar10":
        return D.cifar10(root, cfg.batch_size, cfg.workers, cfg.augment, splits)
    if cfg.data == "svhn":
        return D.svhn(root, cfg.batch_size, cfg.workers, splits)
    if cfg.data == "gtsrb":
        return D.gtsrb(os.path.join(root, "gtsrb"), 32, cfg.batch_size,
                       cfg.workers, splits)
    if cfg.data == "tiny":
        return D.imagenet(os.path.join(root, "imagenet"), 64, cfg.batch_size,
                          cfg.workers, splits, tiny=True)
    if cfg.data == "imagenet":
        h, _, _ = input_shape("imagenet", cfg.model)
        return D.imagenet(os.path.join(root, "imagenet"), h, cfg.batch_size,
                          cfg.workers, splits)
    raise ValueError(f"unknown dataset {cfg.data!r}")


def build_ood_data(cfg, batch_size=None):
    """In-domain/OOD test loader pair (reference evaluate.py:221-243)."""
    import dataclasses
    bs = batch_size or cfg.batch_size
    in_data = build_data(cfg, splits="test")
    if cfg.data == "synthetic":
        rng = np.random.default_rng(cfg.seed + 1)
        h, w, c = input_shape("synthetic")
        x, y = synthetic_images(rng, 256, h, w, c, 10)
        return in_data, D.ArrayLoader(x * 2.0 + 1.0, y, bs)
    if cfg.data == "tokens":
        # OOD = structureless streams: uniform i.i.d. tokens (order=0) —
        # no shared transition with the in-domain Markov process
        t = int(getattr(cfg, "seq_len", 0) or 64)
        rng = np.random.default_rng(cfg.seed + 7)
        x, y = synthetic_tokens(rng, 256, t,
                                getattr(cfg, "vocab", 0)
                                or NUM_CLASSES["tokens"], order=0.0)
        return in_data, D.ArrayLoader(x, y, bs)
    ood_name = D.OOD_PAIRS[cfg.data]
    ood_cfg = dataclasses.replace(cfg, data=ood_name)
    if ood_name == "art":
        h, _, _ = input_shape(cfg.data, cfg.model)
        return in_data, D.art(os.path.join(cfg.data_dir, "imagenet"), h, bs)
    return in_data, build_data(ood_cfg, splits="test")


def layer_filter(cfg):
    """--layers flag -> estimator ``layer_filter`` argument: '' = all,
    'last' = last-layer Laplace, else comma-separated fnmatch patterns."""
    spec = getattr(cfg, "layers", "") or ""
    if not spec:
        return None
    if spec == "last":
        return "last"
    return [p.strip() for p in spec.split(",") if p.strip()]
