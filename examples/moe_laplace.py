"""Laplace over a Switch-style mixture-of-experts GPT-2, in one script.

Demonstrates the MoE curvature surface (no reference analogue — the
reference has neither transformers nor MoE):

  1. a Switch GPT-2 (top-1-routed two-layer experts, ``nn.MoE``) on a
     synthetic token stream;
  2. KFAC per-token Fisher with PER-EXPERT Kronecker factors
     ([E, F, F] A / [E, O, O] G per MoE layer) — zero estimator changes;
  3. expert routing utilization read straight off the captured
     mask-routed activation streams;
  4. damping tuned by evidence (marginal-likelihood) gradient ascent —
     no validation passes;
  5. a per-token Bayesian predictive vs the MAP baseline;
  6. if the host exposes >= 2 devices: the same update under an
     ``expert``-sharded mesh (expert parallelism), factor-exact.

    python examples/moe_laplace.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--experts", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=32)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--samples", type=int, default=8)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from curvature_tpu import estimators, models, parallel
    from curvature_tpu.eval.marglik import marglik_gradient_tune

    model = models.gpt2_moe_tiny(num_classes=64, experts=args.experts,
                                 max_len=args.seq_len)
    rng = jax.random.PRNGKey(0)
    toks = jax.random.randint(rng, (8 * args.batches, args.seq_len), 0, 64)
    variables = model.init(jax.random.PRNGKey(1), toks[:8])

    # -- per-expert factors ------------------------------------------------
    est = estimators.KFAC(model, variables, loss="lm")
    est.update_batches(toks.reshape(args.batches, 8, args.seq_len),
                       jax.random.PRNGKey(2), num_samples=2)
    a = est.state["h.0.moe.fc1"]["a"]
    print(f"h.0.moe.fc1 per-expert A factors: {tuple(a.shape)} "
          f"(E={args.experts} experts)")

    # -- routing utilization from the captured masked streams --------------
    _, aux = model.apply(variables, toks[:8], capture=True, train=False)
    xm = aux["acts"]["h.0.moe.fc1"]              # [E, B, T, F] masked tokens
    routed = jnp.any(xm != 0, axis=-1).reshape(args.experts, -1)
    frac = np.asarray(jnp.mean(routed.astype(jnp.float32), axis=-1))
    print("h.0 expert utilization:",
          " ".join(f"e{i}={f:.2f}" for i, f in enumerate(frac)),
          f"(balanced = {1 / args.experts:.2f})")

    # -- evidence-tuned damping, posterior predictive ----------------------
    tuned = marglik_gradient_tune(est, 10.0, steps=60)
    est.invert(add=tuned["norms"], multiply=tuned["scales"])
    print(f"evidence-tuned damping add={tuned['norms'][0]:.4f} "
          f"multiply={tuned['scales'][0]:.4f} "
          f"(log marglik {tuned['log_marglik']:.1f})")

    labels = np.asarray(toks[:8, 1:])
    logits, _ = model.apply(variables, toks[:8], train=False)
    lp = jax.nn.log_softmax(logits[:, :-1], -1)
    map_nll = -float(np.mean(np.take_along_axis(
        np.asarray(lp), labels[..., None], -1)))

    acc = np.zeros(labels.shape, np.float64)
    for i in range(args.samples):
        p = est.posterior_params(jax.random.PRNGKey(10 + i))
        lg, _ = model.apply({"params": p, "batch_stats": {}}, toks[:8],
                            train=False)
        pr = jax.nn.softmax(lg[:, :-1].astype(jnp.float32), -1)
        acc += np.take_along_axis(np.asarray(pr), labels[..., None],
                                  -1)[..., 0]
    bnn_nll = -float(np.mean(np.log(acc / args.samples + 1e-12)))
    print(f"per-token NLL: MAP {map_nll:.4f} | "
          f"BNN({args.samples} samples) {bnn_nll:.4f}")

    # -- expert parallelism (needs >= 2 devices) ---------------------------
    if len(jax.devices()) >= 2:
        mesh = parallel.make_mesh({"expert": 2,
                                   "data": len(jax.devices()) // 2},
                                  devices=jax.devices()[: 2 * (
                                      len(jax.devices()) // 2)])
        sh = estimators.KFAC(model, variables, loss="lm").use_mesh(mesh)
        sh.update(toks[:8], labels=jnp.asarray(toks[:8])[None])
        ref = estimators.KFAC(model, variables, loss="lm")
        ref.update(toks[:8], labels=jnp.asarray(toks[:8])[None])
        np.testing.assert_allclose(
            np.asarray(sh.state["h.0.moe.fc1"]["a"]),
            np.asarray(ref.state["h.0.moe.fc1"]["a"]), rtol=1e-5, atol=1e-6)
        spec = sh.state["h.0.moe.fc1"]["a"].sharding.spec
        print(f"expert-sharded factors on {mesh.shape}: spec={spec} "
              "(exact vs single-device)")
    print("done")


if __name__ == "__main__":
    main()
