"""Block-level unit tests: AdaIN state machine, noise generators, Snake,
angle codecs."""
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.models.blocks import (
    AdaIN,
    NoiseGenerator,
    NoiseGeneratorV2,
    Snake,
    angles_to_unit_norm_vector,
    unit_norm_vector_to_angles,
)


def test_adain_training_is_identity():
    m = AdaIN(dim=4, train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 4)), jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x)
    y = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_adain_learn_and_transfer():
    m = AdaIN(dim=4, train=False, max_batch=2)
    rng = np.random.default_rng(1)
    x_src = jnp.asarray(rng.standard_normal((2, 64, 4)) * 2 + 1, jnp.float32)
    x_tgt = jnp.asarray(rng.standard_normal((2, 64, 4)) * 0.5 - 3, jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x_src)
    st = dict(v["adain"])

    # learn target ('y') statistics
    st["learn_y"] = jnp.ones(1)
    _, upd = m.apply({"adain": st}, x_tgt, mutable=["adain"])
    st = dict(upd["adain"])
    assert float(st["num_update_y"][0]) == 1
    assert abs(float(st["mean_y"][:2].mean()) - float(x_tgt.mean())) < 0.3

    # learn source ('x') statistics
    st["learn_y"] = jnp.zeros(1)
    st["learn_x"] = jnp.ones(1)
    _, upd = m.apply({"adain": st}, x_src, mutable=["adain"])
    st = dict(upd["adain"])
    assert float(st["num_update_x"][0]) == 1

    # transfer: with both stats learned and learn flags off, the output of
    # source-like input moves toward the target statistics
    st["learn_x"] = jnp.zeros(1)
    y, _ = m.apply({"adain": st}, x_src, mutable=["adain"])
    assert abs(float(y.mean()) - float(x_tgt.mean())) < abs(
        float(x_src.mean()) - float(x_tgt.mean())
    )


def test_noise_generator_v2_shapes_and_scale():
    m = NoiseGeneratorV2(
        in_size=8, hidden_size=8, data_size=4, ratios=(2, 2), noise_bands=3
    )
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 16, 8)), jnp.float32)
    v = m.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, x)
    y = m.apply(
        {k: x2 for k, x2 in v.items() if k != "cache"},
        x,
        rngs={"noise": jax.random.key(2)},
    )
    assert y.shape == (2, 16, 4)
    # mod_sigmoid(x - 5) keeps initial noise quiet (reference blocks.py:283)
    assert float(jnp.abs(y).max()) < 0.5


def test_noise_generator_v1_shapes():
    m = NoiseGenerator(in_size=8, data_size=2, ratios=(2, 2), noise_bands=3)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 8)), jnp.float32)
    v = m.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, x)
    y = m.apply(
        {k: x2 for k, x2 in v.items() if k != "cache"},
        x,
        rngs={"noise": jax.random.key(2)},
    )
    assert y.shape == (2, 16, 2)


def test_snake_activation():
    m = Snake(dim=4)
    x = jnp.linspace(-2, 2, 32).reshape(1, 8, 4)
    v = m.init({"params": jax.random.key(0)}, x)
    y = m.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x + jnp.sin(x) ** 2), atol=1e-5
    )


def test_angle_codec_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 6)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    ang = unit_norm_vector_to_angles(jnp.asarray(x))
    assert ang.shape == (2, 16, 5)
    assert float(jnp.abs(ang).max()) <= 1.0 + 1e-6
    back = angles_to_unit_norm_vector(ang)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)
