"""RVQ unit tests (a coverage gap in the reference, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.models.quantization import (
    EuclideanCodebook,
    ResidualVectorQuantization,
    VectorQuantization,
)


def _data(n=256, d=8, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((2, n, d)), jnp.float32
    )


def test_codebook_kmeans_init_and_update():
    cb = EuclideanCodebook(dim=8, codebook_size=16, kmeans_iters=5)
    x = _data()
    variables = cb.init({"params": jax.random.key(0)}, x, train=False)
    state0 = variables["codebook"]
    assert float(state0["inited"]) == 0.0  # eval init leaves k-means pending

    (q, idx), upd = cb.apply(
        variables, x, train=True, rng=jax.random.key(2), mutable=["codebook"]
    )
    state1 = upd["codebook"]
    assert float(state1["inited"]) == 1.0
    assert q.shape == x.shape
    assert idx.shape == x.shape[:-1]
    assert int(idx.max()) < 16
    # EMA statistics moved
    assert float(jnp.sum(state1["cluster_size"])) > 0


def test_codebook_encode_decode_consistent():
    cb = EuclideanCodebook(dim=4, codebook_size=8, kmeans_init=False)
    x = _data(d=4)
    variables = cb.init({"params": jax.random.key(0)}, x)
    idx = cb.apply(variables, x, method="encode")
    dec = cb.apply(variables, idx, method="decode")
    # re-encoding the decoded vectors must be a fixed point
    idx2 = cb.apply(variables, dec, method="encode")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_vq_straight_through_gradient():
    vq = VectorQuantization(dim=8, codebook_size=16, kmeans_init=False)
    x = _data()
    variables = vq.init(
        {"params": jax.random.key(0)}, x, train=True, rng=jax.random.key(1)
    )

    def loss(xx):
        (q, _, _), _ = vq.apply(
            variables, xx, train=True, rng=jax.random.key(2), mutable=["codebook"]
        )
        return jnp.sum(q**2)

    g = jax.grad(loss)(x)
    # straight-through: gradients flow to the encoder side
    assert float(jnp.abs(g).sum()) > 0


def test_rvq_residual_stack_and_roundtrip():
    rvq = ResidualVectorQuantization(
        num_quantizers=3, dim=8, codebook_size=16, kmeans_init=False
    )
    x = _data()
    variables = rvq.init(
        {"params": jax.random.key(0)}, x, train=True, rng=jax.random.key(1)
    )
    (q, loss, idx), _ = rvq.apply(
        variables, x, train=True, rng=jax.random.key(2), mutable=["codebook"]
    )
    assert q.shape == x.shape
    assert idx.shape == (2, 3, x.shape[1])
    assert np.isfinite(float(loss))

    codes = rvq.apply(variables, x, method="encode")
    assert codes.shape == (2, 3, x.shape[1])
    dec = rvq.apply(variables, codes, method="decode")
    assert dec.shape == x.shape
    # more quantizers -> lower residual error than a single stage
    err_full = float(jnp.mean((dec - x) ** 2))
    dec1 = rvq.apply(variables, codes.at[:, 1:].set(0), method="decode")
    assert err_full < float(jnp.mean((x - dec1) ** 2)) * 2 + 1.0


def test_dead_code_expiry():
    cb = EuclideanCodebook(
        dim=4, codebook_size=8, kmeans_init=False, threshold_ema_dead_code=2
    )
    x = _data(d=4)
    variables = cb.init(
        {"params": jax.random.key(0)}, x, train=True, rng=jax.random.key(1)
    )
    embed0 = variables["codebook"]["embed"]
    (_, _), upd = cb.apply(
        variables, x, train=True, rng=jax.random.key(2), mutable=["codebook"]
    )
    # all-zero cluster_size at start => every code below threshold gets
    # replaced by batch samples
    assert not np.allclose(np.asarray(embed0), np.asarray(upd["codebook"]["embed"]))
