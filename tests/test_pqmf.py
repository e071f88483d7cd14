import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.ops.pqmf import PQMFBank, reverse_half


@pytest.mark.parametrize("n_band,attenuation", [(16, 100), (4, 100), (8, 80)])
def test_roundtrip_zero_delay(n_band, attenuation):
    bank = PQMFBank.build(attenuation, n_band)
    rng = np.random.default_rng(0)
    T = 8192
    x = rng.standard_normal((2, T)).astype(np.float32)
    z = bank.analyze(jnp.asarray(x))
    assert z.shape == (2, T // n_band, n_band)
    y = np.asarray(bank.synthesize(z))
    assert y.shape == (2, T)
    edge = bank.taps * n_band
    sl = slice(edge, T - edge)
    err = y[:, sl] - x[:, sl]
    snr = 10 * np.log10(np.mean(x[:, sl] ** 2) / np.mean(err**2))
    # float32 round-trip of the reference design lands ~49 dB; the filter
    # design itself is ~60 dB (float64). Guard against regressions.
    assert snr > 45.0, snr


def test_single_band_passthrough():
    bank = PQMFBank.build(100, 1)
    x = jnp.ones((2, 64))
    z = bank.analyze(x)
    assert z.shape == (2, 64, 1)
    assert jnp.allclose(bank.synthesize(z), x)


def test_reverse_half_involution():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 10, 8)))
    assert jnp.allclose(reverse_half(reverse_half(x)), x)
