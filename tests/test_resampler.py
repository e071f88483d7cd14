"""Resampler round-trip tests (reference tests/test_resampler.py:11-38)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.ops.resampler import Resampler


@pytest.mark.parametrize(
    "target_sr,model_sr", [(44100, 22050), (48000, 16000), (88200, 22050)]
)
def test_resampler_shapes(target_sr, model_sr):
    r = Resampler(target_sr=target_sr, model_sr=model_sr)
    ratio = target_sr // model_sr
    T = 4096 * ratio
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, T, 1)), jnp.float32)
    variables = r.init({"params": jax.random.key(0)}, x, method="to_model_sampling_rate")
    novar = {k: v for k, v in variables.items() if k != "cache"}
    down = r.apply(novar, x, method="to_model_sampling_rate")
    assert down.shape == (2, T // ratio, 1)
    up = r.apply(novar, down, method="from_model_sampling_rate")
    assert up.shape == (2, T, 1)


def test_resampler_quality():
    """Down->up of a band-limited signal reconstructs it (minus edges)."""
    r = Resampler(target_sr=44100, model_sr=22050)
    sr = 44100
    t = np.arange(16384) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None, :, None]
    xj = jnp.asarray(x)
    variables = r.init({"params": jax.random.key(0)}, xj, method="to_model_sampling_rate")
    novar = {k: v for k, v in variables.items() if k != "cache"}
    y = np.asarray(
        r.apply(
            novar,
            r.apply(novar, xj, method="to_model_sampling_rate"),
            method="from_model_sampling_rate",
        )
    )
    # find best alignment (kaiser filters are nearly linear-phase)
    c = np.correlate(y[0, :, 0].astype(np.float64), x[0, :, 0].astype(np.float64), "full")
    shift = np.argmax(np.abs(c)) - (x.shape[1] - 1)
    sl = slice(2000, 14000)
    err = y[0, sl, 0] - x[0, np.arange(sl.start, sl.stop) - shift, 0]
    snr = 10 * np.log10(np.mean(x**2) / (np.mean(err**2) + 1e-12))
    assert snr > 40, snr


def test_resampler_streaming():
    r = Resampler(target_sr=44100, model_sr=22050, stream_batch=1)
    T = 8192
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, T, 1)), jnp.float32)
    variables = r.init({"params": jax.random.key(0)}, x, method="to_model_sampling_rate")
    novar = {k: v for k, v in variables.items() if k != "cache"}
    y_off = r.apply(novar, x, method="to_model_sampling_rate")
    cache = variables["cache"]
    ys = []
    for i in range(0, T, 1024):
        y, upd = r.apply(
            {**novar, "cache": cache},
            x[:, i : i + 1024],
            method="step_to_model",
            mutable=["cache"],
        )
        cache = upd["cache"]
        ys.append(y)
    y_st = jnp.concatenate(ys, axis=1)
    D = r.down_delay
    a = np.asarray(y_st[:, 2 * D :, 0])
    b = np.asarray(y_off[:, D : y_off.shape[1] - D, 0])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
