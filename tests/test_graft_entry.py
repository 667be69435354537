"""Driver entry-point checks (CPU virtual devices)."""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_small():
    # entry() itself builds ResNet-50/224 (too slow for CPU CI); compile the
    # same code path on a small ResNet instead, and check entry's signature.
    import __graft_entry__ as ge
    assert callable(ge.entry)

    from curvature_tpu import models
    model = models.resnet18(num_classes=10, stem="cifar")
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fn(v, xx):
        logits, _ = model.apply(v, xx, train=False)
        return logits

    out = fn(variables, x)
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())
