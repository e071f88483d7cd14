"""Device-resident dataset (rave_tpu/data/device_data.py).

Pins: the frequency-domain allpass mangle == scipy.signal.lfilter's
time-domain IIR (the host pipeline's exact filter); batch assembly shape/
range/determinism; and the pipeline's sample statistics match the host
pipeline's scope (crop + mangle + dither)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import wavfile
from scipy.signal import lfilter

from rave_tpu.data.device_data import DeviceDataPipeline, allpass_mangle, db_nbytes
from rave_tpu.data.transforms import pole_to_z_filter


@pytest.mark.parametrize("freq_hz", [20.0, 440.0, 1999.0])
def test_allpass_matches_lfilter(freq_hz):
    """Force a known pole angle through both paths (p=1 so it always
    applies); frequency-domain result == scipy's IIR to fp32 accuracy."""
    sr = 44100
    T = 8192
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, T, 1)).astype(np.float32) * 0.3
    # the jax path draws log-uniform in [min_f, max_f]; pin it by setting
    # min_f == max_f == freq_hz
    y = allpass_mangle(
        jnp.asarray(x), jax.random.key(1), sr,
        min_f=freq_hz, max_f=freq_hz, p=1.1,
    )
    omega = 2 * np.pi * freq_hz / sr
    b, a = pole_to_z_filter(omega, 0.99)
    ref = lfilter(b, a, x[0, :, 0]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(y)[0, :, 0], ref, atol=2e-4)


def test_allpass_random_apply():
    """p controls the per-row Bernoulli; unmangled rows pass through
    bit-exactly."""
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((16, 2048, 1)), jnp.float32
    )
    y0 = allpass_mangle(x, jax.random.key(0), 44100, p=0.0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))
    y1 = allpass_mangle(x, jax.random.key(0), 44100, p=1.1)
    assert (np.abs(np.asarray(y1) - np.asarray(x)).max(axis=(1, 2)) > 1e-4).all()
    yh = allpass_mangle(x, jax.random.key(3), 44100, p=0.5)
    changed = np.abs(np.asarray(yh) - np.asarray(x)).max(axis=(1, 2)) > 1e-6
    assert 0 < changed.sum() < 16


@pytest.fixture(scope="module")
def tiny_db(tmp_path_factory):
    from rave_tpu.data.preprocess import preprocess

    root = tmp_path_factory.mktemp("devdata")
    corpus = root / "corpus"
    corpus.mkdir()
    sr, n = 44100, 4096
    t = np.arange(24 * n) / sr
    wav = 0.4 * np.sin(2 * np.pi * 330 * t)
    wavfile.write(corpus / "a.wav", sr, (wav * 32767).astype(np.int16))
    preprocess(str(corpus), str(root / "db"), n, sr, 1, workers=1)
    return str(root / "db")


def test_pipeline_batches(tiny_db):
    assert db_nbytes(tiny_db) == 24 * 4096 * 2
    pipe = DeviceDataPipeline(
        tiny_db, list(range(20)), batch=4, n_signal=2048, sr=44100, seed=7
    )
    a = np.asarray(pipe.batch_at(0))
    assert a.shape == (4, 2048, 1) and a.dtype == np.float32
    assert np.abs(a).max() <= 1.0 + 2**-14  # audio range + dither headroom
    # deterministic in (seed, step); different across steps
    b = np.asarray(pipe.batch_at(0))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(pipe.batch_at(1))
    assert np.abs(a - c).max() > 1e-3


def test_pipeline_crop_offsets(tiny_db):
    """n_signal < record length exercises the on-chip random crop."""
    pipe = DeviceDataPipeline(
        tiny_db, list(range(20)), batch=8, n_signal=1024, sr=44100, seed=1
    )
    xs = [np.asarray(pipe.batch_at(s)) for s in range(3)]
    assert all(x.shape == (8, 1024, 1) for x in xs)
    assert np.abs(xs[0] - xs[1]).max() > 1e-3
