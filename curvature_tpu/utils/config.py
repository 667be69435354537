"""Configuration: one dataclass covering the reference's flag surface.

The reference's entire config system is a single argparse with ~45 flags in
``utils.setup()`` (reference utils.py:333-430). Here the same knob set lives
in a typed dataclass (usable programmatically and from every pipeline CLI),
with ``parse_args``/``setup`` providing the CLI front end. This also fixes
the reference's missing ``--torch_data``/``--data_dir`` flags
(SURVEY.md section 2.7): ``data_dir`` exists and defaults sensibly.
"""
import argparse
import dataclasses
import os
from dataclasses import dataclass


@dataclass
class Config:
    # paths
    root_dir: str = "."
    results_dir: str = "."
    data_dir: str = ""              # dataset location; defaults under root_dir
    prefix: str = ""
    suffix: str = ""
    # compute
    platform: str = ""              # '' = default jax backend; 'cpu' forces CPU
    precision: str = "default"      # 'default' | 'float32' matmul precision
                                    # | 'bfloat16' bf16 eval forwards
    workers: int = 0
    # multi-chip: the reference wires --parallel (DataParallel) into every
    # script (reference utils.py:369, factors.py:86-87); here it builds a
    # jax.sharding.Mesh over all visible devices with the batch sharded on
    # a 'data' axis. --mesh gives explicit axis sizes (overrides
    # --parallel); canonical axis names compose freely — data (batch),
    # sample (MC label draws), seq (LM token dim), model (ScanBlocks depth
    # sharding), tensor (Megatron column parallel), expert (MoE experts) —
    # e.g. "sample:2,data:4" or "model:2,tensor:2,data:2".
    parallel: bool = False
    mesh: str = ""
    # experiment
    model: str = "lenet5"
    data: str = "mnist"
    batch_size: int = 32
    epochs: int = 1
    lr: float = 1e-3
    momentum: float = 0.9
    l2: float = 0.0
    optimizer: str = "random"       # hyperopt optimizer; in the training
                                    # CLI: sgd | adam | kfac (natural-
                                    # gradient preconditioning, optim.py)
    opt_damping: float = 1e-2       # KFAC-optimizer damping (training)
    objective: str = "cost"         # hyperopt objective: 'cost' (the
                                    # reference's (100-acc)+ECE% on the val
                                    # split) | 'marglik' (Laplace evidence —
                                    # no eval passes at all; eval/marglik.py)
    # Laplace approximation
    estimator: str = "kfac"         # diag | block | kfac | efb | inf |
                                    # swag | subspace (global low-rank
                                    # Nyström sketch, width = --rank)
    samples: int = 30               # posterior weight samples
    sample_chunk: int = 0           # max resident sampled param sets (0=all)
    predictive: str = "sampled"     # BNN predictive: 'sampled' (reference MC)
                                    # | 'probit' | 'bridge' (closed-form on
                                    # sampled-logit moments) | 'linearized'
                                    # | 'linearized_probit' |
                                    # 'linearized_bridge' (GLM predictive
                                    # through the MAP-linearized network)
    mc_samples: int = 10            # Fisher MC label samples per batch
    token_subsample: float = 1.0    # KFAC factors: spatial token fraction
                                    # for conv A-factor Grams (<1 = strided
                                    # grid; the measured 697->1447 img/s
                                    # ResNet-50 lever, benchmarks/NOTES.md;
                                    # unbiased over offset grids, tested)
    scan_chunk: int = 8             # batches folded per jitted scan step
    calls: int = 50                 # hyperopt calls
    boundaries: bool = False
    exp_id: str = "-1"
    layer: bool = False             # layer-wise damping
    layers: str = ""                # subnetwork Laplace: 'last' or comma-
                                    # separated fnmatch patterns restricting
                                    # which layers carry curvature (extension
                                    # beyond the reference's type-only
                                    # selection, curvatures.py:57-63)
    pre_scale: int = 1
    augment: bool = False
    norm: float = -1.0
    scale: float = -1.0
    epsilon: float = 0.0
    rank: int = 100
    swag: bool = False              # training: collect a SWAG posterior over
                                    # the SWA window (estimators/swag.py);
                                    # evaluate with --estimator swag
    swag_rank: int = 20             # SWAG deviation ring-buffer size
    bn_update: bool = False         # evaluate --estimator swag: re-estimate
                                    # BatchNorm stats for the SWA mean by
                                    # forwarding the train split (standard
                                    # SWAG practice; estimators/swag.py)
    g_block_size: int = 1024        # KFAC: block size of the block-diagonal
                                    # G factor for dense layers whose
                                    # out_features exceed max_factor_dim
                                    # (vocab-scale LM heads; 0 = hard error
                                    # instead, estimators/kfac.py)
    qkv_split: bool = False         # KFAC: per-q/k/v attention G factors
    head_split: bool = False        # KFAC: per-head attention factor blocks
                                    # (in_proj G [3,H,d,d]; out_proj A
                                    # [H,d,d] + scalar bias block)
    scan_blocks: bool = False       # transformers: lax.scan over depth with
                                    # stacked per-block factors (compile cost
                                    # O(1) in depth; nn/scan.py)
    seq_len: int = 64               # causal LMs (--model gpt2*): context
                                    # length of the --data tokens streams
    vocab: int = 0                  # causal LMs: vocabulary override for
                                    # the model AND the --data tokens
                                    # streams (0 = the dataset default,
                                    # 256; 50257 builds the real GPT-2
                                    # head — blocked-G KFAC territory)
                                    # and the built model's max_len
    fidelity: int = 0               # factors: after accumulation, measure
                                    # each layer's structural error vs the
                                    # EXACT (matrix-free GGN) Fisher on this
                                    # many Rademacher probes (eval/fidelity)
    spectrum: int = 0               # factors: save this many Lanczos steps
                                    # of the TRUE curvature spectrum
                                    # (ops/matfree.lanczos_topk) next to the
                                    # factor artifact
    # toggles
    plot: bool = False
    no_results: bool = False
    stats: bool = False
    calibration: bool = False
    ood: bool = False
    fgsm: bool = False
    loss1d: bool = False
    loss2d: bool = False
    ecdf: bool = False
    entropy: bool = False
    summary: bool = False
    eigvals: bool = False
    hyper: bool = False
    networks: bool = False
    landscapes: bool = False
    verbose: bool = False
    seed: int = 42

    def __post_init__(self):
        if not self.data_dir:
            self.data_dir = os.path.join(self.root_dir, "datasets")


def parse_args(argv=None, **overrides) -> Config:
    """Build a Config from CLI arguments (flag names match the reference's)."""
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        default = overrides.get(f.name, f.default)
        if f.type == bool or isinstance(default, bool):
            parser.add_argument(name, action="store_true", default=default)
        else:
            parser.add_argument(name, type=type(default), default=default)
    ns = parser.parse_args(argv)
    return Config(**vars(ns))


def setup(argv=None, **overrides) -> Config:
    """Parse flags, apply platform/precision, seed RNGs (reference
    utils.setup, utils.py:333-430)."""
    cfg = parse_args(argv, **overrides)
    from curvature_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if cfg.platform:
        import jax
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.precision == "float32":
        import jax
        jax.config.update("jax_default_matmul_precision", "float32")
    from curvature_tpu.utils.monitor import seed_all_rng
    seed_all_rng(cfg.seed)
    return cfg
