"""Per-layer breakdown of the ResNet-50 KFAC factor-Gram phase (round 5).

The round-3/4 ablations (NOTES.md) pinned the Gram phase at 13.7-15.2 ms of
the 24.9-27.7 ms f32 step (55%) and identified the binding resources
(MXU output-accumulation depth + patch-extraction traffic) — but never said
WHICH layers carry the time. This script times every distinct Gram shape
the b16 update executes, one jitted program per shape class, so the
remaining optimization surface is explicit:

  * A-Grams of 3x3 convs: pallas/XLA patch-Gram (policy of
    ops/pallas/patch_gram.select_patch_gram) — timed via the real
    _a_factor path on a synthetic activation;
  * A-Grams of 1x1 convs + fc: dense [N, F] token Grams (einsum);
  * G-Grams: dense [N, O] token Grams (einsum) for every conv + fc.

Prints per-shape ms (count-weighted), the phase total, and the fraction
attributable to dense (symmetric-kernel-addressable) Grams vs patch Grams.

Run: python benchmarks/gram_breakdown.py [--iters N] [--batch B]
"""
import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models


def sync(v):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(v)[0].ravel()[0]))


def timed(fn, args, iters, blocks=3):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv_out(meta, h, w):
    kh, kw = meta.kernel_size
    sh, sw = meta.strides
    if meta.padding == "SAME":
        return (-(-h // sh), -(-w // sw))
    if meta.padding == "VALID":
        return ((h - kh) // sh + 1, (w - kw) // sw + 1)
    (pt, pb), (pl, pr) = meta.padding
    return ((h + pt + pb - kh) // sh + 1, (w + pl + pr - kw) // sw + 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    from curvature_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    model = models.resnet50(num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    est = estimators.KFAC(model, variables)
    b = args.batch

    # trace activation spatial sizes with a host-side shape pass
    shapes = {}
    h = w = 224
    # ResNet-50 activation sizes are determined by the meta chain; recover
    # each conv's input HxW from the module's recorded act shape via one
    # real forward capture on a tiny batch (shape-only; done on host CPU
    # would alter the policy — run on the default backend with b=1)
    from curvature_tpu.estimators.capture import collect
    cap = collect(model, est.metas, variables,
                  jnp.zeros((1, 224, 224, 3), jnp.float32),
                  rng=jax.random.PRNGKey(1), num_samples=1, loss=est.loss,
                  need_param_grads=False)
    for name, meta in est.metas.items():
        shapes[name] = tuple(cap.acts[name].shape[1:])

    print(f"device={jax.devices()[0]} batch={b}", flush=True)

    # ---- group layers by (kind, act-shape, fan_in, out) shape class ----
    classes = collections.Counter()
    metas_by_class = {}
    for name, meta in est.metas.items():
        key = (meta.kind, shapes[name], meta.kernel_size
               if meta.kind == "conv" else None, meta.strides
               if meta.kind == "conv" else None,
               meta.fan_in, meta.out_features)
        classes[key] += 1
        metas_by_class[key] = meta

    rows = []
    total_a = total_g = 0.0
    dense_a = 0.0
    for key, count in sorted(classes.items(),
                             key=lambda kv: -kv[1]):
        kind, act_shape, ks, st, fan_in, out = key
        meta = metas_by_class[key]
        if kind == "conv":
            hh, ww, cc = act_shape
            act = jax.random.normal(jax.random.PRNGKey(2),
                                    (b, hh, ww, cc), jnp.float32)
            ho, wo = conv_out(meta, hh, ww)
            n_tok = b * ho * wo
        else:
            act = jax.random.normal(jax.random.PRNGKey(2),
                                    (b,) + act_shape, jnp.float32)
            n_tok = b

        a_fn = jax.jit(lambda a, m=meta: est._a_factor(m, a))
        t_a = timed(a_fn, (act,), args.iters)

        g_tok = jax.random.normal(jax.random.PRNGKey(3), (1, n_tok, out),
                                  jnp.float32)
        g_fn = jax.jit(lambda g: jnp.einsum(
            "sni,snj->ij", g, g, preferred_element_type=jnp.float32))
        t_g = timed(g_fn, (g_tok,), args.iters)

        is_dense_a = not (kind == "conv" and ks != (1, 1))
        total_a += count * t_a
        total_g += count * t_g
        if is_dense_a:
            dense_a += count * t_a
        flops_a = 2 * n_tok * (fan_in + 1) ** 2 / 1e12
        flops_g = 2 * n_tok * out ** 2 / 1e12
        rows.append((count, kind, act_shape, ks, fan_in, out, n_tok,
                     t_a * 1e3, t_g * 1e3,
                     flops_a / t_a, flops_g / t_g))

    hdr = (f"{'#':>2s} {'kind':5s} {'act':14s} {'k':6s} {'F':>5s} "
           f"{'O':>5s} {'N':>7s} {'A ms':>7s} {'G ms':>7s} "
           f"{'A TF/s':>7s} {'G TF/s':>7s}")
    print(hdr, flush=True)
    for r in rows:
        count, kind, act_shape, ks, fan_in, out, n_tok, ta, tg, fa, fg = r
        print(f"{count:2d} {kind:5s} {str(act_shape):14s} {str(ks):6s} "
              f"{fan_in:5d} {out:5d} {n_tok:7d} {ta:7.3f} {tg:7.3f} "
              f"{fa:7.1f} {fg:7.1f}", flush=True)
    print(f"\nA-Gram total (count-weighted): {total_a * 1e3:8.2f} ms "
          f"(dense/1x1/fc part: {dense_a * 1e3:.2f} ms)", flush=True)
    print(f"G-Gram total (count-weighted): {total_g * 1e3:8.2f} ms",
          flush=True)
    print(f"Gram phase total:              "
          f"{(total_a + total_g) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
