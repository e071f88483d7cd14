"""Config-matrix integration test (the reference's QA backbone,
tests/test_configs.py): build each stock configuration tiny, run the full
encode -> reparametrize -> decode -> discriminate round trip with shape
assertions, mono and stereo."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.config import compose
from rave_tpu.factory import build_discriminator, build_rave

TINY = [
    "capacity=2",
    "discriminator.capacity=2",
    "latent_size=4",
    "latent.num_quantizers=2",
    "latent.codebook_size=16",
    "latent.noise_augmentation=2",
    "decoder.noise_hidden=2",
    "discriminator.encodec_capacity=2",
]

# Fast subset: covers every encoder/decoder/latent/discriminator family.
CONFIGS = [
    ["v1"],
    ["v2"],
    ["v2_small"],
    ["v2_nopqmf"],
    ["v3"],
    ["discrete"],
    ["v2", "wasserstein"],
    ["v2", "spherical"],
    ["hybrid"],
    ["v2", "causal"],
]

# Exhaustive tail (marked slow; XLA compiles dominate on CPU CI).
# Mirrors the reference's config-combination backbone
# (reference tests/test_configs.py:15-42): every stock family, causal
# crossed with every family, SR in {44100, 22050, 48000}, mono + stereo.
CONFIGS_SLOW = [
    ["v2_nopqmf_small"],
    ["v2_with_augs"],
    ["discrete_v3"],
    ["onnx"],
    ["raspberry"],
    ["v2", "snake"],
    ["v2", "adain"],
    ["v2", "noise"],
    ["v2", "spectral_discriminator"],
    # causal x every family (reference doubles its whole list with
    # causal.gin, tests/test_configs.py:37)
    ["v1", "causal"],
    ["discrete", "causal"],
    ["v2_small", "causal"],
    ["v2_nopqmf", "causal"],
    ["v3", "causal"],
    ["hybrid", "causal"],
    ["v2", "wasserstein", "causal"],
    ["v2", "spherical", "causal"],
    ["v2", "noise", "causal"],
    ["v2", "snake", "causal"],
    ["v2", "adain", "causal"],
    ["discrete_v3", "causal"],
    ["onnx", "causal"],
    ["v2_with_augs", "causal"],
    ["v2", "spectral_discriminator", "causal"],
]


@pytest.mark.parametrize(
    "names,n_channels,sr",
    [(c, 1, 44100) for c in CONFIGS]
    + [(["v2"], 2, 44100)]
    + [
        pytest.param(c, 1, 44100, marks=pytest.mark.slow)
        for c in CONFIGS_SLOW
    ]
    + [
        pytest.param(c, 2, 44100, marks=pytest.mark.slow)
        for c in (
            ["v1"], ["discrete"], ["v3"], ["hybrid"], ["v2", "causal"],
            ["v2_nopqmf"], ["v2", "wasserstein"], ["v2", "spherical"],
        )
    ]
    + [
        pytest.param(c, 1, 22050, marks=pytest.mark.slow)
        for c in (
            ["v1"], ["v2"], ["discrete"], ["v3"], ["hybrid"],
            ["v2", "causal"], ["v2_small"],
        )
    ]
    + [
        pytest.param(c, 1, 48000, marks=pytest.mark.slow)
        for c in (["v1"], ["v2"], ["discrete"], ["v2", "causal"], ["v3"])
    ]
    + [
        pytest.param(["v2"], 2, 22050, marks=pytest.mark.slow),
        pytest.param(["v2"], 2, 48000, marks=pytest.mark.slow),
    ],
    ids=lambda v: "-".join(v) if isinstance(v, list) else str(v),
)
def test_config_roundtrip(names, n_channels, sr):
    cfg = compose(names, TINY + [f"sampling_rate={sr}"])
    model = build_rave(cfg, n_channels=n_channels, train=True)
    dis = build_discriminator(cfg, n_channels=n_channels)

    T = 16384
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, T, n_channels)) * 0.3,
        jnp.float32,
    )
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = jax.jit(model.init)(rngs, x)
    nocache = {k: v for k, v in variables.items() if k != "cache"}
    mutable = [k for k in nocache if k != "params"]

    def run(mdl, x):
        x_enc = mdl.transform_input(x)
        z = mdl.encoder(x_enc)
        kw = {}
        if cfg.latent.family == "discrete":
            kw = dict(enabled=True, train=True)
        zs, reg = mdl.reparametrize(z, **kw)
        y = mdl.decode(zs)
        return z, zs, reg, y

    @jax.jit
    def roundtrip(variables, x, rng):
        return model.apply(
            variables, x, rngs={"noise": rng}, method=run, mutable=mutable
        )

    (z, zs, reg, y), _ = roundtrip(nocache, x, jax.random.key(2))

    dec = cfg.decimation()
    n_out = cfg.num_latent_out()
    assert z.shape[-1] == cfg.latent_size * n_out
    assert zs.shape[-1] == cfg.augmented_latent_size()
    assert z.shape[1] == T // dec
    assert y.shape[0] == 2 and y.shape[2] == n_channels
    assert abs(y.shape[1] - T) <= dec  # odd-ratio crops allowed
    assert np.isfinite(float(reg))

    # discriminate
    dvars = jax.jit(dis.init)({"params": jax.random.key(3)}, x)
    feats = jax.jit(dis.apply)(dvars, jnp.concatenate([x, y[:, :T]], axis=0))
    assert len(feats) >= 1
    for scale in feats:
        # batch 2 real + 2 fake; period-folded critics return B*p rows
        # (batch-major, so the real/fake split is preserved)
        assert scale[-1].shape[0] % 4 == 0
