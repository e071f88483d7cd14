"""Distance / schedule / config-system unit tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu import config as config_lib
from rave_tpu.factory import build_audio_distance
from rave_tpu.ops.distances import (
    AudioDistanceV1,
    SpectralDistance,
    WaveformDistance,
    WeightedInstantaneousSpectralDistance,
)
from rave_tpu.ops.stft import MultiScaleSTFT, mel_filterbank, stft
from rave_tpu.train.schedules import beta_factor, quantize_enabled, warmed_up


def _sig(seed=0, n=8192):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((2, n, 1)) * 0.3, jnp.float32
    )


def test_audio_distance_v1():
    d = AudioDistanceV1(
        MultiScaleSTFT(scales=(512, 256, 128), sample_rate=44100), 1e-7
    )
    x = _sig()
    assert float(d(x, x)["spectral_distance"]) < 1e-5
    y = _sig(1)
    v = float(d(x, y)["spectral_distance"])
    assert v > 0.1
    # closer signal -> smaller distance
    v2 = float(d(x, x + 0.01 * y)["spectral_distance"])
    assert v2 < v


def test_instantaneous_distance():
    d = WeightedInstantaneousSpectralDistance(
        MultiScaleSTFT(scales=(512,), sample_rate=44100, magnitude=False),
        weighted=True,
    )
    x, y = _sig(), _sig(1)
    out = d(x, y)
    assert float(out["spectral_distance"]) > 0
    assert np.isfinite(float(out["phase_distance"]))


def test_spectral_distance_mel():
    d = SpectralDistance(n_fft=512, sampling_rate=44100, mel=32)
    x = _sig()
    assert float(d(x, x)) < 1e-6
    assert float(d(x, _sig(2))) > 0


def test_waveform_distance():
    x = _sig()
    assert float(WaveformDistance("L1")(x, x)) == 0


def test_mel_filterbank_properties():
    fb = mel_filterbank(44100, 1024, 64)
    assert fb.shape == (64, 513)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(1) > 0).all()


def test_stft_shapes():
    x = jnp.zeros((2, 4096))
    s = stft(x, 1024, 256)
    assert s.shape == (2, 4096 // 256 + 1, 513)


def test_schedules():
    assert not warmed_up(10, 100)
    assert warmed_up(100, 100)
    assert quantize_enabled(0, -1)
    assert not quantize_enabled(0, None)
    assert not quantize_enabled(5, 10)
    b0 = float(beta_factor(0, 1e-6, 5e-2, 20000))
    bN = float(beta_factor(20000, 1e-6, 5e-2, 20000))
    assert b0 < 1e-5 and abs(bN - 5e-2) < 1e-9
    # monotone ramp
    bs = [float(beta_factor(s, 1e-6, 5e-2, 1000)) for s in range(0, 1001, 100)]
    assert all(b2 >= b1 for b1, b2 in zip(bs, bs[1:]))


def test_config_compose_and_override():
    cfg = config_lib.compose(["v2", "causal"], ["train.beta_target=0.2"])
    assert cfg.mode == "causal"
    assert cfg.capacity == 96
    assert cfg.train.beta_target == 0.2
    h1 = config_lib.config_hash(cfg)
    cfg2 = config_lib.compose(["v2", "causal"], ["train.beta_target=0.2"])
    assert h1 == config_lib.config_hash(cfg2)
    # snapshot -> from_dict round trip
    import json

    cfg3 = config_lib.from_dict(json.loads(config_lib.snapshot(cfg)))
    assert config_lib.config_hash(cfg3) == h1
    with pytest.raises(KeyError):
        config_lib.compose(["nope"])


def test_config_geometry():
    cfg = config_lib.compose(["v2"])
    assert cfg.decimation() == 2048
    assert cfg.block_size() == 2048
    cfg = config_lib.compose(["v2_nopqmf"])
    assert cfg.output_mode == "raw"
    up = 1
    for r in cfg.dec_ratios():
        up *= r
    assert up == 2048
