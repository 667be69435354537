"""Internal benchmark suite: all reference-published timings, plus the
ResNet-50 north-star pipeline (BASELINE.md).

Run on the TPU: ``python benchmarks/suite.py [--quick]``. Prints one JSON
line per measurement (bench.py stays the single-line driver benchmark).

Reference baselines (tutorial.ipynb outputs, unstated GPU; BASELINE.md):
  - LeNet-5 Diagonal update, 10 MC samples/batch .... ~80 it/s
  - LeNet-5 KFAC update, 1 MC sample/batch .......... ~259 it/s
  - LeNet-5 EFB update, 10 MC samples/batch ......... ~63 it/s
  - LeNet-5 eval forward, batch 256 ................. ~75-83 it/s
  - training (SGD), batch 32 ........................ ~317-333 it/s
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.estimators.capture import collect
from curvature_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

def device_sync(tree):
    """True device synchronization: fetch one scalar to the host.

    jax.block_until_ready does NOT block on the axon tunnel backend
    (measured: a matmul chain "finished" at 25,000 TFLOP/s under
    block_until_ready vs 42 TFLOP/s under a host transfer), so every
    timing here syncs by pulling a data-dependent scalar.
    """
    import numpy as _np
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _np.asarray(jax.device_get(jnp.ravel(leaf)[0]))



def timed(fn, args, iters, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / iters


def timed_carry(step, state, iters, warmup=3):
    """Time a state-donating step by threading the state through."""
    for _ in range(warmup):
        state = step(state)
    device_sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    device_sync(state)
    return (time.perf_counter() - t0) / iters


def report(metric, value, unit, baseline=None):
    line = {"metric": metric, "value": round(value, 3), "unit": unit}
    if baseline:
        line["vs_baseline"] = round(value / baseline, 2)
    print(json.dumps(line))


def lenet_updates(iters):
    model = models.lenet5()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (32, 28, 28, 1), jnp.float32)
    variables = model.init(rng, x)

    for name, cls, mc, baseline in (
            ("diag_update_10mc", estimators.Diagonal, 10, 80.0),
            ("kfac_update_1mc", estimators.KFAC, 1, 259.0),
            ("kfac_update_10mc", estimators.KFAC, 10, None)):
        est = cls(model, variables)

        def step(state, variables, x, rng):
            cap = collect(model, est.metas, variables, x, rng=rng,
                          num_samples=mc, train=True,
                          need_param_grads=est.need_param_grads,
                          need_probe_grads=est.need_probe_grads)
            return est.update_state(state, cap)
        step = jax.jit(step, donate_argnums=0)
        dt = timed_carry(lambda s: step(s, variables, x, rng),
                         est.init_state(), iters)
        report(f"lenet5_{name}_b32", 1.0 / dt, "it/s", baseline)

    # EFB (10 MC) on top of KFAC factors
    kfac = estimators.KFAC(model, variables)
    kfac.update(x, rng=rng, num_samples=1)
    efb = estimators.EFB(model, variables, kfac.state)

    def efb_step(carry, variables, x, rng):
        cap = collect(model, efb.metas, variables, x, rng=rng,
                      num_samples=10, train=True,
                      need_probe_grads=False)
        return efb.update_state(carry, cap)
    efb_step = jax.jit(efb_step, donate_argnums=0)
    dt = timed_carry(lambda c: efb_step(c, variables, x, rng),
                     (efb.state, efb.diags, efb.eigvecs), iters)
    report("lenet5_efb_update_10mc_b32", 1.0 / dt, "it/s", 63.0)

    # eval forward, batch 256
    xl = jax.random.normal(rng, (256, 28, 28, 1), jnp.float32)

    @jax.jit
    def fwd(variables, x):
        logits, _ = model.apply(variables, x, train=False)
        return jax.nn.softmax(logits, -1)
    dt = timed(fwd, (variables, xl), iters)
    report("lenet5_eval_b256", 1.0 / dt, "it/s", 79.0)

    # 30-sample Bayesian eval, batch 256 (the reference runs 30 full passes:
    # effective baseline 79/30 = 2.6 it/s per-dataset-pass equivalent)
    kfac.invert(0.5, 1.0)
    ensemble = kfac.ensemble_params(rng, 30)

    @jax.jit
    def bnn_fwd(ens, x):
        def one(p):
            logits, _ = model.apply({"params": p, "batch_stats": {}}, x,
                                    train=False)
            return jax.nn.softmax(logits, -1)
        return jnp.mean(jax.vmap(one)(ens), axis=0)
    dt = timed(bnn_fwd, (ensemble, xl), iters)
    report("lenet5_bnn30_eval_b256", 1.0 / dt, "it/s", 79.0 / 30)


def resnet50_pipeline(iters, batch=16, compute_dtype=None,
                      token_subsample=1.0, tag=""):
    """The BASELINE.json north-star config: ResNet-50/ImageNet KFAC factor
    update + inversion + 30-sample eval. ``--bf16`` / ``--subsample`` map to
    compute_dtype=bfloat16 (native-MXU Grams) and token_subsample=0.25
    (unbiased positional MC, see the exactness test)."""
    model = models.resnet50(num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    est = estimators.KFAC(model, variables, compute_dtype=compute_dtype,
                          token_subsample=token_subsample)

    # route through est._step_rng so compute_dtype casting applies (calling
    # collect directly bypasses _cast_compute — the bf16 variant would
    # silently measure f32); the first call is guarded: at some (batch,
    # dtype) combinations XLA's co-scheduling overflows scoped vmem around
    # the Pallas patch-Gram inside THIS fused program specifically (NOTES
    # round-5) — fall back to the XLA Grams and re-jit
    def make_step():
        return jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1),
                       donate_argnums=0)
    step = make_step()
    try:
        warm = step(est.init_state(), variables, x, rng)
        device_sync(warm)
    except Exception as e:                       # noqa: BLE001
        if not est._pallas_fallback(e):
            raise
        print(f"# resnet50 b{batch}{tag}: pallas fell back to XLA Grams")
        step = make_step()
        warm = step(est.init_state(), variables, x, rng)
        device_sync(warm)
    del warm
    dt = timed_carry(lambda s: step(s, variables, x, rng), est.init_state(),
                     max(iters // 4, 2))
    report(f"resnet50_kfac_update_1mc_b{batch}{tag}", 1.0 / dt, "it/s")
    report(f"resnet50_kfac_update_img_s{tag}", batch / dt, "img/s")

    est.state = step(est.init_state(), variables, x, rng)
    device_sync(est.state)
    device_sync(est.invert(2.0, 20000.0))  # compile warmup
    t0 = time.perf_counter()
    inv = est.invert(1.0, 18916.0)
    device_sync(inv)
    report("resnet50_kfac_invert_54layers", time.perf_counter() - t0, "s")

    ens = est.ensemble_params(rng, 30)   # compile warmup
    device_sync(ens)
    t0 = time.perf_counter()
    ens = est.ensemble_params(jax.random.PRNGKey(7), 30)
    device_sync(ens)
    report("resnet50_sample30_ensembles", time.perf_counter() - t0, "s")

    @jax.jit
    def bnn_fwd(ens, bstats, x):
        def one(p):
            logits, _ = model.apply({"params": p, "batch_stats": bstats}, x,
                                    train=False)
            return jax.nn.softmax(logits, -1)
        return jnp.mean(jax.vmap(one)(ens), axis=0)
    # vary the input per call so nothing can be reused across iterations
    xs = [jax.random.normal(jax.random.PRNGKey(10 + i), x.shape) for i in range(4)]
    it = iter(range(10 ** 9))
    out = bnn_fwd(ens, variables["batch_stats"], xs[0])
    device_sync(out)
    n = max(iters // 2, 8)
    t0 = time.perf_counter()
    for i in range(n):
        out = bnn_fwd(ens, variables["batch_stats"], xs[i % 4])
    device_sync(out)
    dt = (time.perf_counter() - t0) / n
    report(f"resnet50_bnn30_eval_b{batch}", batch / dt, "img/s")
    report(f"resnet50_bnn30_eval_fwd_img_s", 30 * batch / dt, "img/s")


def grouped_pipeline(iters, batch=16, tag="", **est_kw):
    """Grouped/depthwise-model KFAC on the chip: resnext50_32x4d (grouped
    3x3 bottlenecks, 224px) and efficientnet_b0 (depthwise + SE, 224px).
    Factor update throughput + 30-sample BNN eval — models the reference's
    KFAC cannot run at all (grouped convs shape-mismatch its unfold A,
    reference curvatures.py:328-335), so there is no reference baseline;
    the comparison point is our own ResNet-50 path. ``--bf16`` /
    ``--subsample`` apply the same production knobs as the ResNet-50 rows."""
    for arch, size in (("resnext50_32x4d", 224), ("efficientnet_b0", 224)):
        model = models.build(arch, num_classes=1000)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (batch, size, size, 3), jnp.float32)
        variables = model.init(rng, x)
        est = estimators.KFAC(model, variables, **est_kw)
        step = jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1),
                       donate_argnums=0)
        dt = timed_carry(lambda s: step(s, variables, x, rng),
                         est.init_state(), max(iters // 4, 2))
        report(f"{arch}_kfac_update{tag}_img_s", batch / dt, "img/s")

        est.state = step(est.init_state(), variables, x, rng)
        device_sync(est.state)
        device_sync(est.invert(2.0, 20000.0))   # compile warmup
        t0 = time.perf_counter()
        device_sync(est.invert(1.0, 18916.0))
        report(f"{arch}_kfac_invert{tag}", time.perf_counter() - t0, "s")

        ens = est.ensemble_params(rng, 30)
        device_sync(ens)

        @jax.jit
        def bnn_fwd(ens, bstats, x):
            def one(p):
                logits, _ = model.apply(
                    {"params": p, "batch_stats": bstats}, x, train=False)
                return jax.nn.softmax(logits, -1)
            return jnp.mean(jax.vmap(one)(ens), axis=0)

        xs = [jax.random.normal(jax.random.PRNGKey(10 + i), x.shape)
              for i in range(4)]
        out = bnn_fwd(ens, variables["batch_stats"], xs[0])
        device_sync(out)
        n = max(iters // 2, 8)
        t0 = time.perf_counter()
        for i in range(n):
            out = bnn_fwd(ens, variables["batch_stats"], xs[i % 4])
        device_sync(out)
        dt = (time.perf_counter() - t0) / n
        report(f"{arch}_bnn30_eval{tag}_fwd_img_s", 30 * batch / dt, "img/s")


def vit_pipeline(iters, batch=16, qkv_split=True):
    """ViT-B/16 KFAC update + invert + 30-sample BNN eval — the attention
    workload the reference cannot run at all (NotImplementedError,
    curvatures.py:303-304)."""
    model = models.vit_b_16(num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    est = estimators.KFAC(model, variables, attention_qkv_split=qkv_split)

    step = jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1),
                   donate_argnums=0)
    dt = timed_carry(lambda s: step(s, variables, x, rng), est.init_state(),
                     max(iters // 8, 2))
    report(f"vit_b16_kfac_update_1mc_b{batch}", 1.0 / dt, "it/s")
    report("vit_b16_kfac_update_img_s", batch / dt, "img/s")

    est.state = step(est.init_state(), variables, x, rng)
    device_sync(est.state)
    device_sync(est.invert(2.0, 20000.0))
    t0 = time.perf_counter()
    inv = est.invert(1.0, 18916.0)
    device_sync(inv)
    report("vit_b16_kfac_invert_50layers", time.perf_counter() - t0, "s")

    ens = est.ensemble_params(rng, 30)
    device_sync(ens)

    @jax.jit
    def bnn_fwd(ens, x):
        def one(p):
            logits, _ = model.apply({"params": p, "batch_stats": {}}, x,
                                    train=False)
            return jax.nn.softmax(logits, -1)
        return jnp.mean(jax.vmap(one)(ens), axis=0)
    xs = [jax.random.normal(jax.random.PRNGKey(10 + i), x.shape)
          for i in range(4)]
    out = bnn_fwd(ens, xs[0])
    device_sync(out)
    n = max(iters // 4, 8)
    t0 = time.perf_counter()
    for i in range(n):
        out = bnn_fwd(ens, xs[i % 4])
    device_sync(out)
    dt = (time.perf_counter() - t0) / n
    report(f"vit_b16_bnn30_eval_b{batch}", batch / dt, "img/s")
    report("vit_b16_bnn30_eval_fwd_img_s", 30 * batch / dt, "img/s")


def gpt2_pipeline(iters, batch=8, seq=512, samples=30,
                  compute_dtype=None, tag=""):
    """GPT-2 124M per-token Fisher chain: depth-scanned KFAC update
    (loss='lm', block layers tracked — the 50257-dim lm_head stays excluded
    per the documented max_factor_dim recipe), invert, and a 30-sample
    per-token BNN predictive. The reference has no language models at all
    (SURVEY.md section 2.3); this is the transformer half of the perf
    story made measurable (VERDICT r3 #4)."""
    model = models.gpt2(scan_blocks=True, max_len=seq)
    rng = jax.random.PRNGKey(0)
    tok = jax.random.randint(rng, (batch, seq), 0, 50257, jnp.int32)
    t0 = time.perf_counter()
    variables = model.init(rng, tok)
    est = estimators.KFAC(model, variables, loss="lm", layer_filter="h.*",
                          compute_dtype=compute_dtype)
    step = jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1),
                   donate_argnums=0)
    state = step(est.init_state(), variables, tok, rng)
    device_sync(state)
    # trace + (possibly cache-warm) compile + first run, process-cold
    report(f"gpt2_124m{tag}_kfac_update_cold_s", time.perf_counter() - t0, "s")
    dt = timed_carry(lambda s: step(s, variables, tok, rng), state,
                     max(iters // 15, 2))
    report(f"gpt2_124m{tag}_kfac_update_tok_s", batch * seq / dt, "tok/s")

    est.state = step(est.init_state(), variables, tok, rng)
    device_sync(est.state)
    device_sync(est.invert(2.0, 20000.0))          # warm the program
    t0 = time.perf_counter()
    inv = est.invert(1.0, 18916.0)
    device_sync(inv)
    report("gpt2_124m_kfac_invert_s", time.perf_counter() - t0, "s")

    from curvature_tpu.nn.core import apply_matrix_delta
    params = variables["params"]

    @jax.jit
    def bnn_nll(inv_state, params, tok, rng):
        # posterior params are drawn INSIDE the scan: one sampled copy
        # resident at a time (a stacked 30-member GPT-2 ensemble would be
        # ~15 GB); the accumulator is the per-token label probability
        labels = tok[:, 1:]
        def body(carry, key):
            deltas = est.sample_state(inv_state, key)
            p = apply_matrix_delta(est.metas, params, deltas)
            logits, _ = model.apply({"params": p, "batch_stats": {}}, tok,
                                    train=False)
            pr = jax.nn.softmax(logits[:, :-1].astype(jnp.float32), -1)
            lp = jnp.take_along_axis(pr, labels[..., None], -1)[..., 0]
            return carry + lp, None
        keys = jax.random.split(rng, samples)
        acc, _ = jax.lax.scan(body, jnp.zeros(labels.shape, jnp.float32),
                              keys)
        return -jnp.mean(jnp.log(acc / samples + 1e-12))

    toks = [jax.random.randint(jax.random.PRNGKey(10 + i), tok.shape, 0,
                               50257, jnp.int32) for i in range(4)]
    out = bnn_nll(inv, params, toks[0], rng)
    device_sync(out)
    n = max(iters // 60, 2)
    t0 = time.perf_counter()
    for i in range(n):
        out = bnn_nll(inv, params, toks[i % 4], rng)
    device_sync(out)
    dt = (time.perf_counter() - t0) / n
    report(f"gpt2_124m_bnn{samples}_eval_tok_s", batch * seq / dt, "tok/s")
    report(f"gpt2_124m_bnn{samples}_eval_nll", float(out), "nll")
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            report("gpt2_124m_hbm_peak_gib",
                   stats["peak_bytes_in_use"] / 2**30, "GiB")
    except Exception:
        pass


def moe_pipeline(iters, batch=8, seq=256, experts=8):
    """Switch-style MoE GPT-2 (dim 256, depth 4, E=8 two-layer experts):
    per-token Fisher update with per-expert Kronecker factors + invert.
    Dense top-1 dispatch (MXU-batched einsums over the expert axis) — the
    capacity-free formulation pays E x the expert FLOPs but keeps static
    shapes; this row measures what that costs at factor-update time. The
    reference has no MoE support at all."""
    from curvature_tpu.models.gpt import gpt2_moe_custom
    model = gpt2_moe_custom(vocab=1024, dim=256, depth=4, heads=4,
                            experts=experts, max_len=seq)
    rng = jax.random.PRNGKey(0)
    tok = jax.random.randint(rng, (batch, seq), 0, 1024, jnp.int32)
    t0 = time.perf_counter()
    variables = model.init(rng, tok)
    est = estimators.KFAC(model, variables, loss="lm", layer_filter="h.*",
                          compute_dtype=compute_dtype)
    step = jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1),
                   donate_argnums=0)
    state = step(est.init_state(), variables, tok, rng)
    device_sync(state)
    report("gpt2_moe_kfac_update_cold_s", time.perf_counter() - t0, "s")
    dt = timed_carry(lambda s: step(s, variables, tok, rng), state,
                     max(iters // 10, 2))
    report("gpt2_moe_kfac_update_tok_s", batch * seq / dt, "tok/s")

    est.state = step(est.init_state(), variables, tok, rng)
    device_sync(est.state)
    device_sync(est.invert(2.0, 20000.0))
    t0 = time.perf_counter()
    inv = est.invert(1.0, 18916.0)
    device_sync(inv)
    report("gpt2_moe_kfac_invert_s", time.perf_counter() - t0, "s")
    deltas = est.sample(jax.random.PRNGKey(1))
    device_sync(deltas)
    n_expert_blocks = sum(int(m.stacked) for m in est.metas.values()
                          if getattr(m, "moe", False))
    report("gpt2_moe_expert_factor_blocks", n_expert_blocks, "blocks")


def resnet18_inf_pipeline():
    """BASELINE.json config 4: INF on ResNet-18/CIFAR-10-shaped data —
    the full four-estimator chain timed per phase."""
    import numpy as np
    model = models.resnet18(num_classes=10, stem="cifar")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (128, 32, 32, 3), jnp.float32)
    variables = model.init(rng, x)

    diag = estimators.Diagonal(model, variables)
    kfac = estimators.KFAC(model, variables)
    # warmup/compile
    diag.update(x, rng=rng, num_samples=4)
    kfac.update(x, rng=rng, num_samples=4)
    device_sync((diag.state, kfac.state))
    t0 = time.perf_counter()
    for i in range(8):
        key = jax.random.PRNGKey(10 + i)
        diag.update(x, rng=key, num_samples=4)
        kfac.update(x, rng=key, num_samples=4)
    device_sync((diag.state, kfac.state))
    report("resnet18_diag+kfac_update_4mc_b128", 8 / (time.perf_counter() - t0),
           "it/s")

    efb = estimators.EFB(model, variables, kfac.state)
    efb.update(x, rng=rng, num_samples=4)
    device_sync(efb.state)
    t0 = time.perf_counter()
    for i in range(8):
        efb.update(x, rng=jax.random.PRNGKey(30 + i), num_samples=4)
    device_sync(efb.state)
    report("resnet18_efb_update_4mc_b128", 8 / (time.perf_counter() - t0),
           "it/s")

    t0 = time.perf_counter()
    inf = estimators.INF(model, variables, diag.state, kfac.state, efb.state,
                         eigvecs=efb.eigvecs)
    inf.update(rank=100, max_product=1024, bucket=8)
    device_sync(inf.state)
    report("resnet18_inf_build_rank100_cap1024", time.perf_counter() - t0, "s")

    # warm rebuild: the production pattern (new data, same shapes)
    t0 = time.perf_counter()
    inf.update(rank=100, max_product=1024, bucket=8)
    device_sync(inf.state)
    report("resnet18_inf_rebuild_warm", time.perf_counter() - t0, "s")

    inf.invert(1e3, 1e5)   # compile warmup
    device_sync(inf.inv_state)
    t0 = time.perf_counter()
    inf.invert(254.0, 206.0)   # README.rst ResNet18 INF row
    device_sync(inf.inv_state)
    report("resnet18_inf_invert", time.perf_counter() - t0, "s")

    ens = inf.ensemble_params(rng, 30)
    device_sync(ens)
    t0 = time.perf_counter()
    ens = inf.ensemble_params(jax.random.PRNGKey(77), 30)
    device_sync(ens)
    report("resnet18_inf_sample30", time.perf_counter() - t0, "s")

    @jax.jit
    def bnn_fwd(ens, bstats, x):
        def one(p):
            logits, _ = model.apply({"params": p, "batch_stats": bstats}, x,
                                    train=False)
            return jax.nn.softmax(logits, -1)
        return jnp.mean(jax.vmap(one)(ens), axis=0)
    out = bnn_fwd(ens, variables["batch_stats"], x)
    device_sync(out)
    t0 = time.perf_counter()
    for i in range(8):
        out = bnn_fwd(ens, variables["batch_stats"], x)
    device_sync(out)
    dt = (time.perf_counter() - t0) / 8
    report("resnet18_inf_bnn30_eval_b128", 128 / dt, "img/s")


def subspace_swag_pipeline(iters, batch=128, rank=32):
    """Round-over-round perf accountability for the two newest estimators
    (VERDICT r4 weak #6): Subspace (global Nyström sketch) update / invert /
    30-draw sampling, and SWAG collect / finalize / 30-draw sampling, on
    ResNet-18 class sizes."""
    from curvature_tpu.estimators.swag import SWAG
    model = models.resnet18(num_classes=10, stem="cifar")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 32, 32, 3), jnp.float32)
    variables = model.init(rng, x)

    sub = estimators.Subspace(model, variables, rank=rank)
    sub.update(x, rng=rng)                     # compile warmup
    device_sync(sub.state)
    reps = max(iters // 20, 3)
    t0 = time.perf_counter()
    for i in range(reps):
        sub.update(x, rng=jax.random.PRNGKey(10 + i))
    device_sync(sub.state)
    report(f"resnet18_subspace_update_rank{rank}_b{batch}",
           reps / (time.perf_counter() - t0), "it/s")

    sub.invert(1.0, 1e3)                       # compile warmup
    device_sync(sub.inv_state)
    t0 = time.perf_counter()
    sub.invert(2.0, 1e4)
    device_sync(sub.inv_state)
    report("resnet18_subspace_invert", time.perf_counter() - t0, "s")

    ens = sub.ensemble_params(rng, 30)
    device_sync(ens)
    t0 = time.perf_counter()
    ens = sub.ensemble_params(jax.random.PRNGKey(77), 30)
    device_sync(ens)
    report("resnet18_subspace_sample30", time.perf_counter() - t0, "s")

    swag = SWAG(model, variables, rank=20)
    params = variables["params"]
    swag.collect(params)                       # compile warmup
    device_sync(swag._mean)
    t0 = time.perf_counter()
    for i in range(reps):
        swag.collect(jax.tree_util.tree_map(
            lambda p: p * (1.0 + 1e-4 * i), params))
    device_sync(swag._mean)
    report(f"resnet18_swag_collect_b{batch}",
           reps / (time.perf_counter() - t0), "it/s")

    swag.finalize()
    swag.invert()
    ens = swag.ensemble_params(rng, 30)
    device_sync(ens)
    t0 = time.perf_counter()
    ens = swag.ensemble_params(jax.random.PRNGKey(78), 30)
    device_sync(ens)
    report("resnet18_swag_sample30", time.perf_counter() - t0, "s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-resnet", action="store_true")
    ap.add_argument("--skip-lenet", action="store_true")
    ap.add_argument("--inf-pipeline", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--subsample", action="store_true")
    ap.add_argument("--batch", type=int, default=16,
                    help="ResNet-50 row batch size (bf16 scales with batch:"
                         " 756/902/922 img/s at 16/32/64, NOTES round-5;"
                         " f32 is batch-flat)")
    ap.add_argument("--vit", action="store_true")
    ap.add_argument("--gpt2", action="store_true")
    ap.add_argument("--moe", action="store_true")
    ap.add_argument("--grouped", action="store_true")
    args = ap.parse_args()
    iters = 60 if args.quick else 300
    if not args.skip_lenet:
        lenet_updates(iters)
    if args.inf_pipeline:
        resnet18_inf_pipeline()
        return
    if args.vit:
        vit_pipeline(iters)
        return
    if args.gpt2:
        gpt2_pipeline(iters,
                      compute_dtype=jnp.bfloat16 if args.bf16 else None,
                      tag="_bf16" if args.bf16 else "")
        return
    if args.moe:
        moe_pipeline(iters)
        return
    if args.grouped:
        kw = {}
        tag = ""
        if args.bf16:
            kw["compute_dtype"] = jnp.bfloat16
            tag += "_bf16"
        if args.subsample:
            kw["token_subsample"] = 0.25
            tag += "_sub4"
        grouped_pipeline(iters, tag=tag, **kw)
        return
    if not args.skip_resnet:
        kw = {}
        tag = ""
        if args.bf16:
            kw["compute_dtype"] = jnp.bfloat16
            tag += "_bf16"
        if args.subsample:
            kw["token_subsample"] = 0.25
            tag += "_sub4"
        resnet50_pipeline(iters, batch=args.batch, tag=tag, **kw)


if __name__ == "__main__":
    main()
