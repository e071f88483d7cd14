"""Native (C++) ARS sampler tests; skipped when g++ is unavailable."""
import numpy as np
import pytest

from rave_tpu.data.store import ArsWriter

native = pytest.importorskip("rave_tpu.data.native")


@pytest.fixture
def db(tmp_path):
    w = ArsWriter(str(tmp_path / "db"), num_signal=4096, channels=2, sr=44100)
    rng = np.random.default_rng(0)
    for _ in range(12):
        w.append((rng.standard_normal((4096, 2)) * 8000).astype(np.int16))
    w.close()
    return str(tmp_path / "db")


def _sampler(db, **kw):
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    return native.NativeSampler(db, 4096, 2, crop=1024, sr=44100, **kw)


def test_native_sampler_basic(db):
    s = _sampler(db)
    assert len(s) == 12
    b = s.sample(np.arange(6), 0)
    assert b.shape == (6, 1024, 2)
    assert b.dtype == np.float32
    assert np.isfinite(b).all()
    assert 0.05 < b.std() < 1.0


def test_native_sampler_determinism(db):
    s = _sampler(db, seed=7)
    a = s.sample(np.arange(4), 3)
    b = s.sample(np.arange(4), 3)
    np.testing.assert_array_equal(a, b)
    c = s.sample(np.arange(4), 4)
    assert not np.array_equal(a, c)


def test_native_matches_python_scale(db):
    """Without dither/mangle the native crop must be an exact int16/32767
    slice of the record."""
    from rave_tpu.data.store import ArsReader

    s = native.NativeSampler(
        db, 4096, 2, crop=4096, sr=44100, dither_bits=0, mangle_p=0.0
    )
    b = s.sample(np.asarray([3]), 0)[0]
    rec = ArsReader(db)[3].astype(np.float32) / 32767.0
    np.testing.assert_allclose(b, rec, atol=1e-7)


def test_native_loader(db):
    from rave_tpu.data.loader import NativeLoader

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    loader = NativeLoader(db, np.arange(12), batch=4, crop=1024, sr=44100)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0].shape == (4, 1024, 2)
