"""Worker process for the real multi-process distributed test.

Launched by tests/test_distributed.py: N processes x 4 virtual CPU devices
each, joined through ``jax.distributed`` over localhost. Exercises the
multi-process branches of parallel/distributed.py (initialize, global_mesh,
process_batch_slice, host_local_to_global) plus one batch-sharded Diagonal
factor update whose replicated result process 0 writes to disk.
"""
import os
import sys


def main():
    port, pid, nproc, out = sys.argv[1:5]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    import jax

    # NOTE: the JAX_PLATFORMS env var is silently overridden by this
    # image's platform plugin; only the config update actually selects CPU.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    # multi-process CPU backends need a cross-process collectives impl
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from curvature_tpu import estimators, models
    from curvature_tpu.parallel import distributed as D
    from curvature_tpu.parallel.mesh import sharded_update_fn

    D.initialize(f"localhost:{port}", int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()
    mesh = D.global_mesh()
    assert mesh.devices.size == 4 * int(nproc)

    # deterministic inputs, identical on every process
    rng = np.random.default_rng(0)
    x_full = rng.standard_normal((16, 5)).astype(np.float32)
    labels_full = rng.integers(0, 4, size=(2, 16))

    model = models.mlp([7], 4)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_full))
    est = estimators.Diagonal(model, variables)

    sl = D.process_batch_slice(16)
    xg = D.host_local_to_global(x_full[sl], mesh)
    lg = D.host_local_to_global(labels_full[:, sl], mesh,
                                spec=P(None, "data"))
    assert xg.shape == (16, 5)          # global shape, local shards

    step = sharded_update_fn(est, mesh)
    state = step(est.state, est.variables, xg, lg)

    if int(pid) == 0:
        np.savez(out, **{k: np.asarray(v) for k, v in state.items()})
    # all processes participate in the collectives above; exit cleanly
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
