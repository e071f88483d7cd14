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
    g = T.RandomGain((-6, -6), prob=1.0)(rng, x * 0.1)
    assert np.allclose(g, x * 0.1 * 10 ** (-6 / 20), atol=1e-5)
    c = T.Compose(T.RandomCrop(128), T.Dequantize(16))(rng, x)
    assert c.shape == (128, 1)
    p = T.RandomPitch(1000)(rng, x)
    assert p.shape == (1000, 1)
    fm = T.FrequencyMasking(p=1.0)(rng, x)
    assert fm.shape == x.shape
    cp = T.RandomCompress(prob=1.0)(rng, x * 0.5)
    assert cp.shape == x.shape


def test_derivator_integrator_parity():
    """The derivator/integrator pair matches the reference's exact filters
    (rave/dataset.py:24-29): derivator = 0.5*(1 - z^-1); integrator = the
    leaky double-pole inverse. The cascade has passband gain alpha^2/2 and a
    2nd-order 10 Hz highpass — verified as a gain-compensated round trip on
    a signal with no sub-20 Hz content."""
    from scipy.signal import lfilter

    sr = 44100
    rng = np.random.default_rng(0)
    t = np.arange(4 * sr) / sr
    x = sum(
        a * np.sin(2 * np.pi * f * t)
        for a, f in [(0.4, 110.0), (0.3, 523.25), (0.2, 3000.0)]
    ).astype(np.float32)[:, None]

    der, integ = T.get_derivator_integrator(sr)
    alpha = 1 / (1 + 1 / sr * 2 * np.pi * 10)

    # exact parity with the reference coefficients (scipy oracle)
    d_ref = lfilter([0.5, -0.5], [1.0], x, axis=0)
    np.testing.assert_allclose(der(x), d_ref, atol=1e-7)
    i_ref = lfilter(
        [alpha**2, -(alpha**2)], [1, -2 * alpha, alpha**2], d_ref, axis=0
    )
    np.testing.assert_allclose(integ(d_ref), i_ref, atol=1e-7)

    # Derivator transform (the dataset pipeline entry) = the same filter
    np.testing.assert_allclose(
        T.Derivator()(rng, x), d_ref.astype(np.float32), atol=1e-6
    )

    # the der->integ cascade equals its analytic rational filter
    # 0.5*alpha^2*(1-z^-1)^2 / (1-alpha*z^-1)^2 sample-exactly
    b_cas = 0.5 * np.convolve([0.5 * 2, -0.5 * 2], [alpha**2, -(alpha**2)])
    a_cas = np.convolve([1.0], [1, -2 * alpha, alpha**2])
    y = integ(der(x))
    y_analytic = lfilter(b_cas, a_cas, x, axis=0)
    np.testing.assert_allclose(y, y_analytic, atol=1e-10)

    # round trip: the cascade is a 2nd-order 10 Hz highpass at gain
    # alpha^2/2 — above the cutoff, gain compensation recovers the signal
    # up to the residual phase lead (~2*atan(10/f) rad); at 1 kHz+ that is
    # inaudible and numerically small
    t_hi = np.arange(2 * sr) / sr
    x_hi = (0.5 * np.sin(2 * np.pi * 1000.0 * t_hi)).astype(np.float32)[:, None]
    y_hi = integ(der(x_hi)) * 2 / alpha**2
    warm = sr
    rel = np.linalg.norm(y_hi[warm:] - x_hi[warm:]) / np.linalg.norm(x_hi[warm:])
    # predicted residual = the cascade's phase lead 2*atan(fc/f) ~ 0.020 rad
    predicted = 2 * np.arctan(10.0 / 1000.0)
    assert abs(rel - predicted) < 0.002, (
        f"1 kHz round trip error {rel} != predicted phase residual {predicted}"
    )


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


# ---- sox compand parity (reference rave/transforms.py:114-145) ------------


def test_compand_transfer_parsing():
    knee, pts = T.parse_sox_transfer("6:-70,-60,-20")
    # odd count: first value is a lone identity point; (0,0) appended
    assert knee == 6.0
    assert pts == [(-70.0, -70.0), (-60.0, -20.0), (0.0, 0.0)]
    knee, pts = T.parse_sox_transfer("6:-30,-15,-10,-8,0,-5")
    assert pts == [(-30.0, -15.0), (-10.0, -8.0), (0.0, -5.0)]


def test_transfer_fn_exact_on_straight_segments():
    # negligible knee -> exact piecewise-linear in the dB domain
    tf = T.TransferFn([(-60.0, -60.0), (-20.0, -10.0), (0.0, 0.0)], knee_db=0.01)
    def db(v):
        return 20 * np.log10(tf(np.asarray([10 ** (v / 20)]))[0])
    assert abs(db(-60) - (-60)) < 1e-6
    # at a vertex the residual knee (0.01 dB wide) shifts by (m2-m1)*r/4
    assert abs(db(-20) - (-10)) < 2e-3
    # midpoint of segment (-60,-60)->(-20,-10): slope 1.25
    assert abs(db(-40) - (-60 + 1.25 * 20)) < 1e-6
    # flat below the first point (sox lsx_compandt)
    assert abs(db(-90) - (-60)) < 1e-6


def test_transfer_fn_soft_knee_is_c1():
    # knee deviation at the vertex is (m2-m1)*r/4 in log units
    import math
    tf = T.TransferFn([(-60.0, -60.0), (-20.0, -10.0), (0.0, 0.0)], knee_db=6.0)
    L = math.log(10) / 20
    m1, m2, r = 1.25, 0.5, 3.0 * L
    y = math.log(tf(np.asarray([10 ** (-20 / 20)]))[0])
    expected = -10.0 * L + (m2 - m1) * r / 4
    assert abs(y - expected) < 1e-9
    # smooth: no slope jumps across the knee window
    xs_db = np.linspace(-26, -14, 400)
    ys = np.log(tf(10 ** (xs_db / 20)))
    slopes = np.diff(ys) / np.diff(xs_db * L)
    assert np.all(np.abs(np.diff(slopes)) < 0.05)


def test_envelope_follow_fast_path_matches_loop():
    rng = np.random.default_rng(0)
    level = np.abs(rng.standard_normal(1000))
    a = 1 - np.exp(-1 / 100)
    ref = T.envelope_follow(level, a, a * 0.999999, 0.01)  # loop path
    fast = T.envelope_follow(level, a, a, 0.01)  # lfilter path
    np.testing.assert_allclose(ref, fast, atol=1e-5)


def test_envelope_follow_attack_release_asymmetry():
    level = np.concatenate([np.ones(500), np.zeros(2000)])
    ac, rc = 1 - np.exp(-1 / 50), 1 - np.exp(-1 / 500)
    v = T.envelope_follow(level, ac, rc, 0.0)
    # rising edge: ~63% after 50 samples
    assert abs(v[49] - (1 - np.exp(-50 / 50))) < 0.02
    # falling edge: much slower (release tau = 500)
    assert v[500 + 500] > 0.3  # one release tau after the drop


def test_compand_instant_mode_matches_static_curve():
    # attack/release <= 1/sr -> envelope == |x| samplewise, so the output
    # is exactly the static transfer curve applied per sample
    sr = 1000
    x = (np.linspace(0.001, 0.9, 500).astype(np.float32))[:, None]
    y = T.compand(x, sr, 0.0, 0.0, "0.01:-60,-60,0,0")
    tf = T.TransferFn([(-60.0, -60.0), (0.0, 0.0)], 0.01)
    np.testing.assert_allclose(
        y[:, 0], np.clip(tf(x[:, 0]) / x[:, 0] * x[:, 0], -1, 1), rtol=1e-5
    )


def test_compand_is_memoryful():
    """The envelope follower must make the gain depend on history (the old
    static-curve stand-in failed this): right after a silence->loud step,
    gain still reflects the quiet envelope."""
    sr = 44100
    x = np.concatenate(
        [np.zeros(sr // 2), 0.5 * np.ones(sr // 2)]
    ).astype(np.float32)[:, None]
    # boosting curve for quiet levels: -60 -> -30
    y = T.compand(x, sr, 0.1, 0.1, "6:-60,-30,0,0")
    onset = sr // 2
    g_early = y[onset + 10, 0] / 0.5
    g_late = y[-1, 0] / 0.5
    # early gain is the near-silence boost (clipped at 1.0 -> gain 2.0);
    # settled gain = f(-6.02 dB) - (-6.02 dB) = +3.01 dB (curve slope 0.5)
    assert g_early > g_late + 0.1
    assert abs(g_late - 2 ** 0.5) < 0.02


def test_random_compress_applies_compand():
    rng = np.random.default_rng(3)
    x = (0.3 * np.sin(np.linspace(0, 300, 44100))).astype(np.float32)[:, None]
    rc = T.RandomCompress(prob=1.0, sr=44100)
    y = rc(rng, x)
    assert y.shape == x.shape
    assert not np.allclose(y, x)  # gain changed
    off = T.RandomCompress(prob=0.0, sr=44100)
    np.testing.assert_array_equal(off(rng, x), x)


def test_augmentation_json_and_file_specs(tmp_path):
    augs = T.get_augmentations(
        ['{"type":"RandomCompress","threshold":-40,"amp_range":[-60,-10],"prob":0.5}'],
        44100,
    )
    assert isinstance(augs[0], T.RandomCompress)
    assert augs[0].amp_range == (-60, -10) and augs[0].sr == 44100
    # user augmentation file (the gin-file equivalent)
    f = tmp_path / "my_augs.py"
    f.write_text(
        "add_augmentation(RandomApply(RandomGain((-3.0, 3.0)), p=0.9))\n"
        "add_augmentation(Compress(time='0.01,0.01', lookup='6:-30,-15,0,0', sr=SR))\n"
    )
    augs = T.get_augmentations([str(f)], 22050)
    assert len(augs) == 2
    assert isinstance(augs[0], T.RandomApply)
    assert isinstance(augs[1], T.Compress) and augs[1].sr == 22050
    import pytest as _pytest
    with _pytest.raises(KeyError):
        T.get_augmentations(["nope"], 44100)


def test_lazy_dataset_index_routing(tmp_path, monkeypatch):
    """LazyAudioDataset chunk routing (reference rave/dataset.py:118-156):
    cumsum index maps a flat chunk id to (file, offset) with per-file
    remainders dropped; decode is invoked with the right seek second.
    ffmpeg itself is stubbed so the routing math tests everywhere."""
    import json as _json

    import yaml as _yaml

    from rave_tpu.data import dataset as ds

    sr, n_signal = 1000, 100
    entries = [
        {"path": "/corpus/a.wav", "length": 250},  # 2 chunks (50 dropped)
        {"path": "/corpus/b.wav", "length": 99},   # 0 chunks
        {"path": "/corpus/c.wav", "length": 400},  # 4 chunks
    ]
    (tmp_path / "entries.json").write_text(_json.dumps(entries))
    (tmp_path / "metadata.yaml").write_text(
        _yaml.safe_dump(
            {"lazy": True, "sr": sr, "channels": 1, "num_signal": n_signal}
        )
    )

    calls = []

    def fake_decode(path, start_sec, n, sr_, channels):
        calls.append((path, start_sec))
        return np.full((n, channels), 16384, np.int16)

    monkeypatch.setattr(ds, "decode_slice_ffmpeg", fake_decode)
    d = ds.LazyAudioDataset(str(tmp_path), n_signal)
    assert len(d) == 6
    rng = np.random.default_rng(0)
    for i in range(6):
        x = d.get(i, rng)
        assert x.shape == (n_signal, 1)
        np.testing.assert_allclose(x, 16384 / 32767.0)
    assert calls == [
        ("/corpus/a.wav", 0.0),
        ("/corpus/a.wav", 0.1),
        ("/corpus/c.wav", 0.0),
        ("/corpus/c.wav", 0.1),
        ("/corpus/c.wav", 0.2),
        ("/corpus/c.wav", 0.3),
    ]


def test_lazy_preprocess_end_to_end(tmp_path):
    """`rave-tpu preprocess --lazy` + LazyAudioDataset round trip. Works
    with or without ffmpeg: .wav sources fall back to the header probe +
    mmap slice reader (audio_io._decode_slice_wav)."""
    from scipy.io import wavfile

    from rave_tpu.data.dataset import LazyAudioDataset
    from rave_tpu.data.preprocess import preprocess

    sr, n_signal = 22050, 4096
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    t = np.arange(4 * n_signal) / sr
    wavfile.write(
        corpus / "a.wav", sr,
        (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16),
    )
    meta = preprocess(
        str(corpus), str(tmp_path / "db"), n_signal, sr, 1, lazy=True,
        workers=1,
    )
    assert meta["lazy"] is True
    d = LazyAudioDataset(str(tmp_path / "db"), n_signal)
    assert len(d) == 4
    x = d.get(1, np.random.default_rng(0))
    assert x.shape == (n_signal, 1)
    assert np.abs(x).max() > 0.1


def test_wav_slice_reader_matches_whole_file(tmp_path):
    """The ffmpeg-less mmap slice reader returns exactly the samples a
    whole-file read would, at any offset; resampling slices match a
    whole-file resample to a tolerance set by the polyphase edge."""
    from scipy.io import wavfile

    from rave_tpu.data.audio_io import _decode_slice_wav

    sr, n = 44100, 8192
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(10 * n) * 8000).astype(np.int16)
    p = tmp_path / "x.wav"
    wavfile.write(p, sr, x)
    for start_chunk in (0, 3, 7):
        seg = _decode_slice_wav(str(p), start_chunk * n / sr, n, sr, 1)
        np.testing.assert_array_equal(
            seg[:, 0], x[start_chunk * n : (start_chunk + 1) * n]
        )
    # upsample path: 22050 -> 44100 slice vs whole-file resample
    from scipy.signal import resample_poly

    sr2 = 22050
    p2 = tmp_path / "y.wav"
    wavfile.write(p2, sr2, x)
    seg = _decode_slice_wav(str(p2), 0.0, n, sr, 1)
    ref = resample_poly(x.astype(np.float32) / 32768.0, 2, 1)[:n]
    ref_i16 = np.clip(ref * 32768, -32768, 32767).astype(np.int16)
    assert np.mean(np.abs(seg[:, 0].astype(np.int32) - ref_i16.astype(np.int32))) < 2.0


def test_wav_slice_reader_dtype_normalization(tmp_path):
    """float32 / int32 / uint8 WAVs must decode correctly through the
    ffmpeg-less slice reader, INCLUDING on the resample branch (ADVICE r4:
    the old code divided raw samples by 32768 regardless of dtype, so a
    resampled float32 WAV became silence and int32 saturated)."""
    from scipy.io import wavfile

    from rave_tpu.data.audio_io import _decode_slice_wav

    sr, n = 44100, 4096
    t = np.arange(4 * n) / sr
    wave = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref = np.clip(wave * 32768, -32768, 32767).astype(np.int16)

    cases = {
        "f32.wav": wave,
        "i32.wav": (wave * 2147483647).astype(np.int32),
        "u8.wav": (np.clip((wave * 127 + 128), 0, 255)).astype(np.uint8),
    }
    for name, data in cases.items():
        p = tmp_path / name
        wavfile.write(p, sr, data)
        # no-resample branch
        seg = _decode_slice_wav(str(p), 0.0, n, sr, 1)[:, 0]
        tol = 300 if name == "u8.wav" else 2
        assert np.mean(np.abs(seg.astype(np.int32) - ref[:n].astype(np.int32))) < tol, name
        # resample branch (44.1k file -> 22.05k target): output must keep
        # the signal's energy, not collapse to silence or saturate
        seg2 = _decode_slice_wav(str(p), 0.0, n // 2, sr // 2, 1)[:, 0]
        rms = np.sqrt(np.mean((seg2 / 32768.0) ** 2))
        want = np.sqrt(np.mean(wave[:n] ** 2))
        assert abs(rms - want) < 0.05 * want + 0.02, (name, rms, want)


def test_probe_length_float_wav(tmp_path, monkeypatch):
    """IEEE-float WAVs must probe correctly in the ffmpeg-less path
    (ADVICE r4: the stdlib `wave` probe raised on format-3 WAVs, silently
    dropping them from the lazy dataset)."""
    import shutil as _sh

    from scipy.io import wavfile

    from rave_tpu import data as _data
    from rave_tpu.data import audio_io

    monkeypatch.setattr(audio_io.shutil, "which", lambda name: None)
    sr = 22050
    p = tmp_path / "f.wav"
    wavfile.write(p, sr, np.zeros(3 * sr, np.float32))
    dur, ch = audio_io.probe_length(str(p))
    assert abs(dur - 3.0) < 1e-6 and ch == 1
    # stereo int16 still probes
    p2 = tmp_path / "s.wav"
    wavfile.write(p2, sr, np.zeros((sr, 2), np.int16))
    dur, ch = audio_io.probe_length(str(p2))
    assert abs(dur - 1.0) < 1e-6 and ch == 2


def test_lazy_preprocess_fails_loudly_when_nothing_probes(tmp_path, monkeypatch):
    """A lazy preprocess whose every file fails the probe must raise with
    the file list, not write an empty dataset (ADVICE r4)."""
    import pytest

    from rave_tpu.data import audio_io, preprocess as pp

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "bad.wav").write_bytes(b"RIFFxxxxWAVE")  # not a valid wav
    monkeypatch.setattr(audio_io.shutil, "which", lambda name: None)
    monkeypatch.setattr(pp, "have_ffmpeg", lambda: False)
    with pytest.raises(RuntimeError, match="bad.wav"):
        pp.preprocess(str(corpus), str(tmp_path / "db"), 4096, 22050, 1,
                      lazy=True, workers=1)
