"""Training-step tests: phase selection, determinism, EMA, state shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.config import compose
from rave_tpu.factory import build_discriminator, build_rave
from rave_tpu.train import build_train_steps, create_train_state, pick_phase

TINY = [
    "capacity=2",
    "discriminator.capacity=2",
    "latent_size=4",
    "ratios=[4,4,2]",
    "dilations=[[1],[1],[1]]",
    "distance.scales=[512,256]",
    "train.phase_1_duration=4",
    "train.update_discriminator_every=2",
    "train.beta_warmup_len=8",
    "train.ema=0.99",
]


def test_pick_phase():
    cfg = compose(["v2"], TINY)
    # pre-warmup: always gen
    assert pick_phase(cfg, 0)[0] == "gen"
    assert pick_phase(cfg, 3) == ("gen", False, False)
    # post-warmup: every 2nd step is dis
    assert pick_phase(cfg, 4)[0] == "dis"
    assert pick_phase(cfg, 5)[0] == "gen"
    assert pick_phase(cfg, 6)[0] == "dis"


@pytest.fixture()
def setup():
    cfg = compose(["v2"], TINY)
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=8192)
    steps = build_train_steps(cfg, model, dis, crop_frames=(1, 1))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8192, 1)) * 0.1, jnp.float32
    )
    return cfg, state, steps, x


def test_gen_step_runs_and_is_deterministic(setup):
    cfg, state, steps, x = setup
    s1, m1 = steps["gen"](state, x, jax.random.key(1), warmed=False, quantize=False)
    # rebuild identical state (donated buffers) and repeat
    cfg2 = compose(["v2"], TINY)
    model = build_rave(cfg2, n_channels=1, train=True)
    dis = build_discriminator(cfg2, n_channels=1)
    state2 = create_train_state(cfg2, model, dis, jax.random.key(0), n_signal=8192)
    s2, m2 = steps["gen"](state2, x, jax.random.key(1), warmed=False, quantize=False)
    assert float(m1["loss_gen"]) == float(m2["loss_gen"])  # same seed, same loss
    assert int(s1.step) == 1
    assert np.isfinite(float(m1["loss_gen"]))
    assert float(m1["beta_factor"]) > 0
    # EMA moved toward the updated params
    l0 = jax.tree_util.tree_leaves(s1.ema_params)[0]
    assert np.isfinite(np.asarray(l0)).all()
    return s1, m1


def test_gen_lr_follows_global_step(setup):
    """LinearLR must decay over *global* steps, discriminator batches
    included (reference rave/model.py:272-274), not generator-update
    counts. TINY: phase_1_duration=4, gen_lr=1e-3, floor factor 0.1."""
    cfg, state, steps, x = setup

    def fresh(step):
        cfg2 = compose(["v2"], TINY)
        model = build_rave(cfg2, n_channels=1, train=True)
        dis = build_discriminator(cfg2, n_channels=1)
        s = create_train_state(cfg2, model, dis, jax.random.key(0), n_signal=8192)
        return s.replace(step=jnp.asarray(step, jnp.int32))

    _, m0 = steps["gen"](fresh(0), x, jax.random.key(1), warmed=False, quantize=False)
    assert float(m0["gen_lr"]) == pytest.approx(1e-3)
    # halfway through phase 1 (global step 2 of 4) — even if the optimizer
    # itself has made zero updates so far
    _, m2 = steps["gen"](fresh(2), x, jax.random.key(1), warmed=False, quantize=False)
    assert float(m2["gen_lr"]) == pytest.approx(1e-3 * (1 + 0.5 * (0.1 - 1)))
    # at/after phase-1 end: the 0.1 floor
    _, m9 = steps["gen"](fresh(9), x, jax.random.key(1), warmed=True, quantize=False)
    assert float(m9["gen_lr"]) == pytest.approx(1e-4)


def test_adversarial_and_dis_steps(setup):
    cfg, state, steps, x = setup
    s, m = steps["gen"](state, x, jax.random.key(2), warmed=True, quantize=False)
    assert "feature_matching" in m and "adversarial" in m
    assert float(m["loss_dis"]) > 0
    s, m = steps["dis"](s, x, jax.random.key(3), quantize=False)
    assert float(m["loss_dis"]) > 0
    assert int(s.step) == 2


def test_dis_full_metrics_same_loss(setup):
    """train.dis_full_metrics only adds logging (the reconstruction
    distances) to the dis step — the critic loss and update are identical."""
    cfg, state, steps, x = setup
    s, _ = steps["gen"](state, x, jax.random.key(2), warmed=True, quantize=False)
    s, m_lite = steps["dis"](s, x, jax.random.key(3), quantize=False)
    assert "loss_gen" not in m_lite and "multiband_spectral_distance" not in m_lite

    cfg2 = compose(["v2"], TINY + ["train.dis_full_metrics=true"])
    model = build_rave(cfg2, n_channels=1, train=True)
    dis = build_discriminator(cfg2, n_channels=1)
    state2 = create_train_state(cfg2, model, dis, jax.random.key(0), n_signal=8192)
    steps2 = build_train_steps(cfg2, model, dis, crop_frames=(1, 1))
    s2, _ = steps2["gen"](state2, x, jax.random.key(2), warmed=True, quantize=False)
    s2, m_full = steps2["dis"](s2, x, jax.random.key(3), quantize=False)
    assert "loss_gen" in m_full and "multiband_spectral_distance" in m_full
    assert float(m_full["loss_dis"]) == float(m_lite["loss_dis"])
    a = jax.tree_util.tree_leaves(s.dis_params)[0]
    b = jax.tree_util.tree_leaves(s2.dis_params)[0]
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_bf16_discriminator_matches_fp32(setup):
    """train.bf16_dis runs the critic in bf16 (weights cast per-op) with
    fp32 losses/grads: adversarial losses stay finite and close to the
    fp32 critic's, and the discriminator params still update."""
    cfg, state, steps, x = setup
    _, m_ref = steps["gen"](state, x, jax.random.key(2), warmed=True, quantize=False)

    cfg2 = compose(["v2"], TINY + ["train.bf16_dis=true"])
    model = build_rave(cfg2, n_channels=1, train=True)
    dis = build_discriminator(cfg2, n_channels=1)
    state2 = create_train_state(cfg2, model, dis, jax.random.key(0), n_signal=8192)
    steps2 = build_train_steps(cfg2, model, dis, crop_frames=(1, 1))
    s2, m2 = steps2["gen"](state2, x, jax.random.key(2), warmed=True, quantize=False)
    for k in ("loss_gen", "feature_matching", "adversarial", "loss_dis"):
        assert np.isfinite(float(m2[k])), k
        # bf16 critic compute: same losses within bf16 tolerance
        assert float(m2[k]) == pytest.approx(float(m_ref[k]), rel=0.05), k
    # grads land fp32 on the masters and actually move them
    s2, m2 = steps2["dis"](s2, x, jax.random.key(3), quantize=False)
    leaf = jax.tree_util.tree_leaves(s2.dis_params)[0]
    assert leaf.dtype == jnp.float32
    assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_dis_spectral_discriminator():
    """Spectral critics STFT their (bf16) input — ops/stft.py upcasts at
    the FFT and the image returns in the compute dtype, so bf16_dis
    composes with every discriminator family (caught live on v3)."""
    cfg = compose(
        ["v2", "spectral_discriminator"],
        TINY + ["train.bf16_dis=true", "discriminator.capacity=2"],
    )
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=8192)
    steps = build_train_steps(cfg, model, dis, crop_frames=(1, 1))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8192, 1)) * 0.1, jnp.float32
    )
    _, m = steps["gen"](state, x, jax.random.key(2), warmed=True, quantize=False)
    for k in ("loss_gen", "adversarial", "loss_dis"):
        assert np.isfinite(float(m[k])), k
