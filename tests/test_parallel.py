"""Data-parallel mesh tests on the virtual 8-device CPU mesh.

Skipped when the interpreter started under a hardware-plugin sitecustomize
that froze the device count (see DEVNOTES.md); run with
`PYTHONPATH=/root/repo python -m pytest` for the full 8-device mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.parallel.mesh import data_mesh, replicate, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="virtual 8-device CPU mesh unavailable (plugin sitecustomize froze "
    "the device count; strip .axon_site from PYTHONPATH)",
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_grad_reduction():
    """Gradients of a batch-mean loss over a sharded batch equal the
    single-device result (XLA inserts the psum)."""
    mesh = data_mesh()
    w = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 16)), jnp.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    wr = replicate(mesh, w)
    xs = shard_batch(mesh, x)
    g_sharded = jax.jit(jax.grad(loss))(wr, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-5)


def test_replicated_state_stays_identical():
    """Replicated-buffer invariant: an update computed from the global batch
    is bit-identical on every device (the RVQ codebook contract)."""
    mesh = data_mesh()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 32)), jnp.float32)
    ema = replicate(mesh, jnp.zeros((32,)))
    xs = shard_batch(mesh, x)

    @jax.jit
    def update(ema, x):
        return ema * 0.9 + jnp.mean(x, axis=0) * 0.1

    new = update(ema, xs)
    # gather per-device copies and compare
    arrs = [np.asarray(s.data) for s in new.addressable_shards]
    for a in arrs[1:]:
        np.testing.assert_array_equal(arrs[0], a)


@pytest.mark.slow
def test_full_dp_train_step():
    """The complete two-optimizer GAN step over the 8-device mesh (the
    driver's dryrun_multichip path)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
