"""Data pipeline tests: store round trip, transforms, split, loader."""
import numpy as np
import pytest

from rave_tpu.data import transforms as T
from rave_tpu.data.dataset import AudioDataset, get_dataset, split_dataset
from rave_tpu.data.loader import Loader
from rave_tpu.data.store import ArsReader, ArsWriter, get_training_channels


@pytest.fixture
def db(tmp_path):
    w = ArsWriter(str(tmp_path / "db"), num_signal=1024, channels=2, sr=44100)
    rng = np.random.default_rng(0)
    for _ in range(50):
        w.append((rng.standard_normal((1024, 2)) * 8000).astype(np.int16))
    w.close()
    return str(tmp_path / "db")


def test_store_roundtrip(db):
    r = ArsReader(db)
    assert len(r) == 50
    rec = r[3]
    assert rec.shape == (1024, 2)
    assert rec.dtype == np.int16
    assert get_training_channels(db) == 2
    assert get_training_channels(db, 1) == 1
    with pytest.raises(ValueError):
        get_training_channels(db, 4)


def test_get_dataset_pipeline(db):
    ds = get_dataset(db, 44100, 512)
    rng = np.random.default_rng(1)
    x = ds.get(0, rng)
    assert x.shape == (512, 2)
    assert x.dtype == np.float32
    assert np.abs(x).max() < 2.0


def test_split_deterministic(db):
    ds = AudioDataset(db)
    a1, b1 = split_dataset(ds)
    a2, b2 = split_dataset(ds)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    assert len(a1) + len(b1) == len(ds)
    assert len(b1) == max(1, len(ds) * 2 // 100)


def test_loader_batches(db):
    ds = get_dataset(db, 44100, 512)
    idx = np.arange(len(ds))
    loader = Loader(ds, idx, batch=4, workers=2, prefetch=2)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 4
    assert batches[0].shape == (4, 512, 2)
    # determinism: same epoch twice yields identical batches
    b2 = list(loader.epoch(0))
    np.testing.assert_allclose(batches[0], b2[0])


def test_loader_host_sharding(db):
    ds = get_dataset(db, 44100, 512)
    idx = np.arange(len(ds))
    l0 = Loader(ds, idx, batch=2, host_id=0, host_count=2)
    l1 = Loader(ds, idx, batch=2, host_id=1, host_count=2)
    assert set(l0.indices).isdisjoint(set(l1.indices))
    assert len(l0.indices) + len(l1.indices) == len(idx)


def test_transforms():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1000, 1)).astype(np.float32)
    assert T.RandomCrop(256)(rng, x).shape == (256, 1)
    assert T.RandomCrop(2000)(rng, x).shape == (2000, 1)
    d = T.Dequantize(16)(rng, np.zeros((100, 1), np.float32))
    assert 0 < np.abs(d).max() < 2 ** (-14)
    assert np.allclose(T.RandomMute(p=1.0)(rng, x), 0)
    assert np.allclose(T.RandomMute(p=0.0)(rng, x), x)
    y = T.PhaseMangle(sr=44100)(rng, x)
    assert y.shape == x.shape
    assert not np.allclose(y, x)
    # allpass: magnitude spectrum approximately preserved
    fx = np.abs(np.fft.rfft(x[:, 0]))
    fy = np.abs(np.fft.rfft(y[:, 0]))
    assert np.abs(fx - fy).mean() / fx.mean() < 0.1
    g = T.RandomGain((-6, -6))(rng, x * 0.1)
    assert np.allclose(g, x * 0.1 * 10 ** (-6 / 20), atol=1e-5)
    c = T.Compose(T.RandomCrop(128), T.Dequantize(16))(rng, x)
    assert c.shape == (128, 1)
    p = T.RandomPitch(1000)(rng, x)
    assert p.shape == (1000, 1)
    fm = T.FrequencyMasking(p=1.0)(rng, x)
    assert fm.shape == x.shape
    cp = T.RandomCompress(prob=1.0)(rng, x * 0.5)
    assert cp.shape == x.shape


def test_http_dataset_roundtrip(db):
    """Remote dataset: REST server (stdlib) + HTTPAudioDataset client."""
    import threading
    from http.server import HTTPServer

    from rave_tpu.data.dataset import HTTPAudioDataset
    from rave_tpu.data.store import ArsReader

    reader = ArsReader(db)
    # build the handler the same way serve() does, bind to an ephemeral port
    import base64
    import json
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/len":
                return self._json({"length": len(reader)})
            if self.path.startswith("/get/"):
                i = int(self.path.split("/")[-1])
                rec = reader[i]
                return self._json(
                    {
                        "data": base64.b64encode(
                            np.ascontiguousarray(rec, "<i2").tobytes()
                        ).decode(),
                        "channels": int(rec.shape[1]),
                        "sr": reader.meta["sr"],
                    }
                )
            return self._json({"error": "nf"}, 404)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        ds = HTTPAudioDataset(f"http://127.0.0.1:{port}")
        assert len(ds) == len(reader)
        x = ds.get(2, np.random.default_rng(0))
        np.testing.assert_allclose(
            x, reader[2].astype(np.float32) / 32767.0, atol=1e-7
        )
    finally:
        srv.shutdown()


def test_augmentation_registry():
    augs = T.get_augmentations(["mute", "compress", "gain"], 44100)
    assert len(augs) == 3
    T.add_augmentation("custom", lambda sr: T.RandomMute(0.5))
    assert len(T.get_augmentations(["custom"], 44100)) == 1
