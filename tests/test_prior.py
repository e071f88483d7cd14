"""Prior tests: quantizer round trip, diagonal shift inverse, causal
teacher-forcing, streaming generation consistency."""
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.prior.core import DiagonalShift, QuantizedNormal
from rave_tpu.prior.model import Prior, generate, prior_loss


def test_quantized_normal_roundtrip():
    qn = QuantizedNormal(64, dither=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 4)), jnp.float32)
    oh = qn.encode(x)
    assert oh.shape == (2, 32, 4 * 64)
    dec = qn.decode(oh)
    # quantization error bounded by bin width in CDF space
    err = np.abs(np.asarray(dec) - np.asarray(jnp.clip(x, -4, 4)))
    assert np.quantile(err, 0.95) < 0.25


def test_diagonal_shift_inverse():
    ds = DiagonalShift()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 4)), jnp.float32)
    y = ds(x)
    assert y.shape == (2, 29, 4)
    inv = ds.inverse(y)
    assert inv.shape == (2, 26, 4)
    # shift-then-inverse restores the interior
    np.testing.assert_allclose(np.asarray(inv), np.asarray(x[:, 3:29]), atol=1e-6)


def test_prior_causality_and_loss():
    prior = Prior(latent_size=2, resolution=8, res_size=16, skp_size=8, n_layers=3)
    T = 32
    x = jax.nn.one_hot(
        jnp.asarray(np.random.default_rng(2).integers(0, 8, (1, T, 2))), 8
    ).reshape(1, T, 16)
    params = prior.init({"params": jax.random.key(0)}, x)["params"]
    y1 = prior.apply({"params": params}, x)
    # causality: changing the future must not change past outputs
    x2 = x.at[:, -1].set(0.0)
    y2 = prior.apply({"params": params}, x2)
    np.testing.assert_allclose(
        np.asarray(y1[:, :-1]), np.asarray(y2[:, :-1]), atol=1e-6
    )
    loss = prior_loss(prior, params, x, 2)
    assert np.isfinite(float(loss))


def test_prior_loss_pad_rows_equivalent():
    """The small-batch workaround (prior/train.py pads the batch to 8 rows
    and passes n_real) must produce the same loss AND gradients as the
    unpadded computation — padding exists only to sidestep the XLA:TPU
    space_to_batch_converter abort (DEVNOTES.md)."""
    prior = Prior(latent_size=2, resolution=8, res_size=16, skp_size=8, n_layers=3)
    T, B = 32, 2
    x = jax.nn.one_hot(
        jnp.asarray(np.random.default_rng(4).integers(0, 8, (B, T, 2))), 8
    ).reshape(B, T, 16)
    params = prior.init({"params": jax.random.key(0)}, x)["params"]

    loss_plain, g_plain = jax.value_and_grad(
        lambda p: prior_loss(prior, p, x, 2)
    )(params)
    x_pad = jnp.concatenate([x, jnp.zeros((8 - B, T, 16), x.dtype)], axis=0)
    loss_pad, g_pad = jax.value_and_grad(
        lambda p: prior_loss(prior, p, x_pad, 2, n_real=B)
    )(params)
    np.testing.assert_allclose(float(loss_plain), float(loss_pad), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        g_plain, g_pad,
    )


def test_prior_streaming_matches_offline():
    prior = Prior(latent_size=2, resolution=8, res_size=16, skp_size=8, n_layers=3)
    T = 16
    x = jax.nn.one_hot(
        jnp.asarray(np.random.default_rng(3).integers(0, 8, (1, T, 2))), 8
    ).reshape(1, T, 16)
    variables = prior.init({"params": jax.random.key(0)}, x)
    params, cache = variables["params"], variables["cache"]
    y_off = prior.apply({"params": params}, x)
    ys = []
    c = cache
    for t in range(T):
        y, upd = prior.apply(
            {"params": params, "cache": c},
            x[:, t : t + 1],
            method="step",
            mutable=["cache"],
        )
        c = upd["cache"]
        ys.append(y)
    y_st = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_off), atol=1e-5)


def test_generation_shapes():
    prior = Prior(latent_size=2, resolution=8, res_size=16, skp_size=8, n_layers=2)
    x0 = jnp.zeros((1, 1, 16))
    variables = prior.init({"params": jax.random.key(0)}, x0)
    cache = jax.tree_util.tree_map(
        lambda v: jnp.zeros(v.shape, v.dtype), variables["cache"]
    )
    ys = generate(prior, variables["params"], cache, x0, 12, jax.random.key(1))
    assert ys.shape == (1, 12, 16)
    # outputs are stacked one-hots
    s = np.asarray(ys).reshape(1, 12, 2, 8).sum(-1)
    np.testing.assert_allclose(s, 1.0)
