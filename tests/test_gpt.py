"""GPT-2 causal LM: HF checkpoint parity + per-token (``loss='lm'``) Fisher.

The reference is vision-only with NotImplementedError attention factors
(reference curvatures.py:303-304); decoder-only LMs are a capability this
framework adds. The HF oracle is a *randomly initialized*
``GPT2LMHeadModel`` built from a config (no download — this environment has
zero egress), the same pattern as tests/torch_zoo.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
from curvature_tpu.estimators.capture import (
    collect, sample_labels, softmax_cross_entropy)
from curvature_tpu.nn.core import param_matrix

VOCAB, DIM, DEPTH, HEADS, CTX = 97, 32, 2, 2, 16


def _tiny_hf_gpt2():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    torch.manual_seed(0)
    cfg = tfm.GPT2Config(vocab_size=VOCAB, n_positions=CTX, n_embd=DIM,
                         n_layer=DEPTH, n_head=HEADS,
                         resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    return tfm.GPT2LMHeadModel(cfg).eval()


def _tokens(batch=3, t=11, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, VOCAB, size=(batch, t)).astype(np.int32)


@pytest.fixture(scope="module")
def hf_pair():
    """(HF torch model, our converted variables)."""
    torch_model = _tiny_hf_gpt2()
    variables = models.convert_gpt2_state_dict(torch_model.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return torch_model, variables


@pytest.mark.slow
def test_gpt2_hf_logit_parity(hf_pair):
    import torch
    torch_model, variables = hf_pair
    tok = _tokens()
    with torch.no_grad():
        want = torch_model(torch.from_numpy(tok).long()).logits.numpy()
    model = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX)
    model.init(jax.random.PRNGKey(0), jnp.asarray(tok))
    got, _ = model.apply(variables, jnp.asarray(tok), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_gpt2_scan_blocks_match_unrolled(hf_pair):
    _, variables = hf_pair
    tok = jnp.asarray(_tokens())
    model = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX)
    model.init(jax.random.PRNGKey(0), tok)
    want, _ = model.apply(variables, tok, train=False)

    scan = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX,
                              scan_blocks=True)
    scan.init(jax.random.PRNGKey(0), tok)
    stacked = models.stack_scan_groups(
        jax.tree_util.tree_map(np.asarray, variables), scan)
    got, _ = scan.apply(jax.tree_util.tree_map(jnp.asarray, stacked),
                        tok, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_gpt2_head_untying(hf_pair):
    torch_model, variables = hf_pair
    wte = np.asarray(variables["params"]["wte"]["weight"])
    head = np.asarray(variables["params"]["lm_head"]["kernel"])
    np.testing.assert_allclose(head, wte.T, atol=0)  # untied copy of wte^T


@pytest.mark.slow
def test_lm_param_grads_match_jax_grad():
    """collect(loss='lm') param grads == jax.grad of the mean-token CE."""
    model = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX)
    tok = jnp.asarray(_tokens())
    variables = model.init(jax.random.PRNGKey(0), tok)
    labels = jnp.asarray(_tokens(seed=2))          # [B, T] explicit labels

    cap = collect(model, model.metas, variables, tok, labels=labels,
                  loss="lm")
    assert cap.logits.shape == tok.shape + (VOCAB,)

    def loss_fn(params):
        out, _ = model.apply({"params": params, "batch_stats": {}}, tok,
                             train=True)
        return softmax_cross_entropy(out, labels)

    grads = jax.grad(loss_fn)(variables["params"])
    for name, meta in model.metas.items():
        want = param_matrix(meta, grads[name])
        np.testing.assert_allclose(np.asarray(cap.param_grads[name][0]),
                                   np.asarray(want), atol=1e-5, rtol=1e-4,
                                   err_msg=name)


def test_lm_sample_labels_per_token():
    logits = jax.random.normal(jax.random.PRNGKey(0), (3, 7, VOCAB))
    lab = sample_labels(jax.random.PRNGKey(1), logits, 4, loss="lm")
    assert lab.shape == (4, 3, 7)
    assert int(lab.min()) >= 0 and int(lab.max()) < VOCAB


@pytest.mark.slow
def test_lm_all_estimators_chain():
    """Diagonal/KFAC/EFB/INF on the per-token Fisher of a causal LM."""
    model = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX)
    tok = jnp.asarray(_tokens(batch=4, t=8))
    variables = model.init(jax.random.PRNGKey(0), tok)
    rng = jax.random.PRNGKey(1)

    diag = estimators.Diagonal(model, variables, loss="lm")
    diag.update(tok, rng=rng, num_samples=2)
    kfac = estimators.KFAC(model, variables, loss="lm")
    kfac.update(tok, rng=rng, num_samples=2)
    assert "h.0.attn.c_attn" in kfac.state
    assert "lm_head" in kfac.state
    kfac.invert(add=1.0, multiply=1.0)
    s = kfac.sample(jax.random.PRNGKey(2))
    assert s["lm_head"].shape == (VOCAB, DIM)      # bias-free head

    efb = estimators.EFB(model, variables, kfac.state, loss="lm")
    efb.update(tok, rng=rng, num_samples=2)
    inf = estimators.INF(model, variables, diag.state, kfac.state, efb.state)
    inf.update(rank=8)
    inf.invert(add=10.0, multiply=10.0)
    si = inf.sample(jax.random.PRNGKey(3))
    assert all(bool(jnp.isfinite(v).all()) for v in si.values())

    p = kfac.posterior_params(jax.random.PRNGKey(4))
    out, _ = model.apply({"params": p, "batch_stats": {}}, tok, train=False)
    assert bool(jnp.isfinite(out).all())


def test_lm_last_layer_laplace():
    model = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX)
    tok = jnp.asarray(_tokens(batch=4, t=8))
    variables = model.init(jax.random.PRNGKey(0), tok)
    kfac = estimators.KFAC(model, variables, loss="lm", layer_filter="last")
    kfac.update(tok, rng=jax.random.PRNGKey(1), num_samples=2)
    assert set(kfac.state) == {"lm_head"}


def test_causal_mask_blocks_future():
    """Perturbing a future token must not change earlier logits."""
    model = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX)
    tok = jnp.asarray(_tokens(batch=1, t=6))
    variables = model.init(jax.random.PRNGKey(0), tok)
    out1, _ = model.apply(variables, tok, train=False)
    tok2 = tok.at[0, 5].set((tok[0, 5] + 1) % VOCAB)
    out2, _ = model.apply(variables, tok2, train=False)
    np.testing.assert_allclose(np.asarray(out1[0, :5]),
                               np.asarray(out2[0, :5]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[0, 5]), np.asarray(out2[0, 5]))


def test_lm_bfloat16_precision_with_int_tokens():
    """--precision bfloat16 on token data: integer ids must pass through
    the compute-dtype casts unchanged (embedding lookups need integer
    indexers) in estimator updates, eval forwards, and the vmapped
    ensemble forward — only float inputs/params are cast."""
    from curvature_tpu.eval.evaluate import make_ensemble_fn, make_forward_fn
    model = models.gpt2_custom(VOCAB, DIM, DEPTH, HEADS, CTX)
    tok = jnp.asarray(_tokens(batch=4, t=8))
    variables = model.init(jax.random.PRNGKey(0), tok)

    est = estimators.Diagonal(model, variables, loss="lm",
                              compute_dtype=jnp.bfloat16)
    est.update(tok, rng=jax.random.PRNGKey(1), num_samples=1)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in est.state.values())

    fwd = make_forward_fn(model, compute_dtype=jnp.bfloat16)
    p = fwd(variables, tok)
    assert p.shape == (4 * 8, VOCAB) and np.all(np.isfinite(np.asarray(p)))

    est.invert(1.0, 1.0)
    ens = est.ensemble_params(jax.random.PRNGKey(2), 2)
    ens_fwd = make_ensemble_fn(model, compute_dtype=jnp.bfloat16)
    pb = ens_fwd(ens, {}, tok)
    assert np.all(np.isfinite(np.asarray(pb)))
