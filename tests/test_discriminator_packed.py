"""Period-folded (batch-packed) MPD critics == the 2D reference layout.

The fold (models/discriminators.py MultiPeriodDiscriminator.packed,
models/descript.py MPD.packed) moves the period axis into the batch so
the memory-bound stacks run as plain 1D convs: same parameters, same
values (a (k, 1) kernel never mixes the period axis), feature maps a pure
batch-major permutation. These tests pin value and gradient equivalence
and the loss-level invariance train/steps.py relies on."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.models.descript import MPD
from rave_tpu.models.discriminators import MultiPeriodDiscriminator
from rave_tpu.ops.dsp import mean_difference


def _unfold(feat, B, p):
    """[B*p, t, C] -> the unpacked [B, t, p, C] layout."""
    Bp, t, C = feat.shape
    assert Bp == B * p
    return feat.reshape(B, p, t, C).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("periods", [(2, 3), (5, 11)])
def test_mpd_packed_matches_unpacked(periods):
    B, T = 4, 4096
    x = jax.random.normal(jax.random.key(0), (B, T, 1), jnp.float32) * 0.3
    packed = MultiPeriodDiscriminator(periods=periods, capacity=4, packed=True)
    plain = MultiPeriodDiscriminator(periods=periods, capacity=4, packed=False)
    variables = jax.jit(packed.init)(jax.random.key(1), x)
    fp = jax.jit(packed.apply)(variables, x)
    fu = jax.jit(plain.apply)(variables, x)  # same param tree
    assert len(fp) == len(fu) == len(periods)
    for p, sp, su in zip(periods, fp, fu):
        for a, b in zip(sp, su):
            np.testing.assert_allclose(
                np.asarray(_unfold(a, B, p)), np.asarray(b), atol=1e-5
            )


def test_mpd_packed_gradients_match():
    B, T = 2, 2048
    periods = (2, 3)
    x = jax.random.normal(jax.random.key(0), (B, T, 1), jnp.float32) * 0.3
    packed = MultiPeriodDiscriminator(periods=periods, capacity=4, packed=True)
    plain = MultiPeriodDiscriminator(periods=periods, capacity=4, packed=False)
    variables = jax.jit(packed.init)(jax.random.key(1), x)

    def loss(params, mod, xi):
        feats = mod.apply({"params": params}, xi)
        return sum(
            jnp.sum(t.astype(jnp.float32) ** 2)
            for t in jax.tree_util.tree_leaves(feats)
        )

    gp = jax.jit(jax.grad(loss, argnums=(0, 2)), static_argnums=1)(
        variables["params"], packed, x
    )
    gu = jax.jit(jax.grad(loss, argnums=(0, 2)), static_argnums=1)(
        variables["params"], plain, x
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-4
        ),
        gp, gu,
    )


@pytest.mark.parametrize("period", [2, 7])
def test_descript_mpd_packed_matches_unpacked(period):
    B, T = 2, 3 * 1024 + 5  # odd length exercises the reflect pad
    x = jax.random.normal(jax.random.key(0), (B, T, 1), jnp.float32) * 0.3
    packed = MPD(period=period, packed=True)
    plain = MPD(period=period, packed=False)
    variables = jax.jit(packed.init)(jax.random.key(1), x)
    fp = jax.jit(packed.apply)(variables, x)
    fu = jax.jit(plain.apply)(variables, x)
    for a, b in zip(fp, fu):
        np.testing.assert_allclose(
            np.asarray(_unfold(a, B, period)), np.asarray(b), atol=1e-4
        )


def test_fold_preserves_losses():
    """The exact consumers in train/steps.py: real/fake batch split,
    relative + absolute feature matching, GAN-score means — all invariant
    under the fold's batch-major permutation."""
    B, T, p = 4, 512, 3  # B = 2 real + 2 fake
    rng = np.random.default_rng(0)
    # an unfolded feature pair [B, t, p, C] and its folded layout
    a_u = jnp.asarray(rng.standard_normal((B, T, p, 2)), jnp.float32)
    b_u = jnp.asarray(rng.standard_normal((B, T, p, 2)), jnp.float32)
    fold = lambda f: f.transpose(0, 2, 1, 3).reshape(B * p, T, 2)
    a_f, b_f = fold(a_u), fold(b_u)
    for rel in (True, False):
        np.testing.assert_allclose(
            float(mean_difference(a_u, b_u, norm="L1", relative=rel)),
            float(mean_difference(a_f, b_f, norm="L1", relative=rel)),
            rtol=1e-6,
        )
    # real/fake split: first half of the batch stays first after folding
    # (tolerances absorb fp summation-order noise on near-zero means)
    r_u, f_u = jnp.split(a_u, 2, axis=0)
    r_f, f_f = jnp.split(a_f, 2, axis=0)
    np.testing.assert_allclose(
        float(jnp.mean(r_u)), float(jnp.mean(r_f)), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        float(jnp.mean(f_u)), float(jnp.mean(f_f)), rtol=1e-5, atol=1e-7
    )
