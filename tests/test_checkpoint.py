"""Checkpoint save/restore round trip + phase-2 encoder freeze."""
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.config import compose
from rave_tpu.factory import build_discriminator, build_rave
from rave_tpu.train import build_train_steps, create_train_state
from rave_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    search_for_config,
    search_for_run,
)

TINY = [
    "capacity=2",
    "discriminator.capacity=2",
    "latent_size=4",
    "ratios=[4,4,2]",
    "dilations=[[1],[1],[1]]",
    "distance.scales=[512,256]",
]


def _setup(n_signal=8192):
    cfg = compose(["v2"], TINY)
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=n_signal)
    return cfg, model, dis, state


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, dis, state = _setup()
    save_checkpoint(str(tmp_path), 7, jax.device_get(state))
    template = create_train_state(cfg, model, dis, jax.random.key(1), n_signal=8192)
    restored = restore_checkpoint(str(tmp_path), template)
    assert restored is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(state.gen_params),
        jax.tree_util.tree_leaves(restored.gen_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert search_for_run(str(tmp_path)) == str(tmp_path)
    (tmp_path / "config.json").write_text("{}")
    assert search_for_config(str(tmp_path)).endswith("config.json")


def test_phase2_freezes_encoder(tmp_path):
    """After warmup the encoder is stop-gradiented (reference
    rave/blocks.py:743-744): a warmed generator step must leave encoder
    params untouched while the decoder still moves."""
    cfg, model, dis, state = _setup()
    steps = build_train_steps(cfg, model, dis, crop_frames=(1, 1))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8192, 1)) * 0.1, jnp.float32
    )
    enc_before = jax.device_get(state.gen_params["encoder"])
    dec_before = jax.device_get(state.gen_params["decoder"])
    state, _ = steps["gen"](state, x, jax.random.key(1), warmed=True, quantize=False)
    enc_after = jax.device_get(state.gen_params["encoder"])
    dec_after = jax.device_get(state.gen_params["decoder"])
    for a, b in zip(
        jax.tree_util.tree_leaves(enc_before), jax.tree_util.tree_leaves(enc_after)
    ):
        np.testing.assert_array_equal(a, b)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(dec_before),
            jax.tree_util.tree_leaves(dec_after),
        )
    )
    assert moved
