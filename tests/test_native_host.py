"""End-to-end test of the native C++ artifact host (native/rtpu_host.cc).

Proves the full Python-free deployment story: a C++ binary with only the
.rtpu directory (manifest.json + <method>.mlir StableHLO bytecode) and the
PJRT C++ API streams audio block by block, matching the same AOT modules
executed from Python via jax.export.deserialize.

Marked slow: the first build of rtpu_host against the TensorFlow wheel's
XLA headers takes several minutes on a small machine (cached afterwards).
"""
import json
import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu import config as config_lib
from rave_tpu.factory import build_discriminator, build_rave
from rave_tpu.train.state import create_train_state
from rave_tpu.utils.checkpoint import save_checkpoint

pytestmark = pytest.mark.slow

TINY = [
    "capacity=2",
    "discriminator.capacity=2",
    "latent_size=4",
    "ratios=[4,4,2]",
    "dilations=[[1],[1],[1]]",
]


@pytest.fixture(scope="module")
def host_bin():
    from rave_tpu.export.native_host import ensure_host

    path = ensure_host()
    if path is None:
        pytest.skip("no native toolchain or tensorflow wheel")
    return path


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("run")
    from rave_tpu.export.export import export_model

    cfg = config_lib.compose(["v2", "causal"], TINY)
    cfg.data.n_signal = 8192
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=8192)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "config.json").write_text(config_lib.snapshot(cfg))
    save_checkpoint(str(run_dir), 1, jax.device_get(state))
    out = export_model(run=str(run_dir), streaming=True)
    return Path(out)


def _write_wav(path, x_float, sr):
    from scipy.io import wavfile

    q = np.clip(x_float, -1, 1)
    wavfile.write(path, sr, (q * 32767).astype(np.int16))
    # return what the host will actually see after int16 decode
    return (q * 32767).astype(np.int16).astype(np.float32) / 32768.0


def test_manifest_has_native_io_spec(artifact):
    manifest = json.loads((artifact / "manifest.json").read_text())
    for m in ("encode_step", "decode_step", "forward_step"):
        spec = manifest["aot"][m]
        assert "error" not in spec, spec
        assert (artifact / spec["mlir_file"]).exists()
        assert len(spec["inputs"]) == spec["n_state"] + 2  # state..., x, seed
        assert spec["state_inputs"] == list(range(spec["n_state"]))
        n_out = len(spec["outputs"])
        assert spec["state_outputs"] == list(
            range(n_out - spec["n_state"], n_out)
        )
        # state specs match between the two ends of the round trip
        for si, so in zip(spec["state_inputs"], spec["state_outputs"]):
            assert spec["inputs"][si] == spec["outputs"][so]
        # the lowered module keeps every input (state pass-through), so
        # the C++ host can marshal positionally
        assert spec["kept_inputs"] == list(range(len(spec["inputs"])))


def test_host_info(host_bin, artifact):
    out = subprocess.run(
        [host_bin, str(artifact), "info"], capture_output=True, text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "aot_method: forward_step" in out.stdout
    manifest = json.loads((artifact / "manifest.json").read_text())
    assert f"block_size: {manifest['block_size']}" in out.stdout


def test_host_forward_matches_python_aot(host_bin, artifact, tmp_path):
    """rtpu_host forward == the same StableHLO modules run from Python with
    the same seed schedule (tolerance covers the two independent XLA builds
    plus PCM16 output quantization)."""
    from jax import export as jex
    from scipy.io import wavfile

    manifest = json.loads((artifact / "manifest.json").read_text())
    block = manifest["block_size"]
    sr = manifest["sampling_rate"]
    n_blocks = 3
    t = np.arange(n_blocks * block) / sr
    sig = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 880 * t)
    x_host = _write_wav(tmp_path / "in.wav", sig, sr)

    r = subprocess.run(
        [host_bin, str(artifact), "forward", str(tmp_path / "in.wav"),
         str(tmp_path / "out.wav"), "0"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    sr2, y_host = wavfile.read(tmp_path / "out.wav")
    assert sr2 == sr
    y_host = y_host.astype(np.float32) / 32767.0

    fwd = jex.deserialize((artifact / "forward_step.stablehlo").read_bytes())
    from rave_tpu.export.artifact import ExportedRAVE

    art = ExportedRAVE(str(artifact))
    state = {"cache": art.cache}
    ys = []
    for i in range(n_blocks):
        xb = jnp.asarray(
            x_host[i * block : (i + 1) * block].reshape(1, block, 1)
        )
        yb, state = fwd.call(state, xb, jnp.uint32(i))
        ys.append(np.asarray(yb)[0, :, 0])
    y_py = np.concatenate(ys)

    assert y_host.shape == y_py.shape
    # PCM16 write/read quantization alone is ~3e-5; XLA build drift is tiny
    np.testing.assert_allclose(y_host, y_py, atol=5e-4)


def test_host_exe_cache_identical_and_faster_startup(
    host_bin, artifact, tmp_path
):
    """The PJRT executable cache (<artifact>/.exe_cache) must be a pure
    startup optimization: the cached-load run produces byte-identical
    output to both a fresh-compile run and a --no-exe-cache run."""
    import shutil
    import time as _time

    from scipy.io import wavfile  # noqa: F401

    manifest = json.loads((artifact / "manifest.json").read_text())
    block, sr = manifest["block_size"], manifest["sampling_rate"]
    t = np.arange(2 * block) / sr
    _write_wav(tmp_path / "in.wav", 0.3 * np.sin(2 * np.pi * 330 * t), sr)

    cache_dir = artifact / ".exe_cache"
    shutil.rmtree(cache_dir, ignore_errors=True)

    def run(tag, *flags):
        t0 = _time.perf_counter()
        r = subprocess.run(
            [host_bin, *flags, str(artifact), "forward",
             str(tmp_path / "in.wav"), str(tmp_path / f"{tag}.wav"), "3"],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr
        return _time.perf_counter() - t0

    t_cold = run("cold")  # compiles, writes the cache
    assert cache_dir.is_dir() and list(cache_dir.glob("forward_step.*.pjrt"))
    t_warm = run("warm")  # loads the serialized executable
    run("nocache", "--no-exe-cache")
    assert (tmp_path / "cold.wav").read_bytes() == (
        tmp_path / "warm.wav"
    ).read_bytes()
    assert (tmp_path / "cold.wav").read_bytes() == (
        tmp_path / "nocache.wav"
    ).read_bytes()
    # generous bound: the warm start skips the StableHLO compile entirely
    # (measured 12x on the full-size artifact); tiny test artifacts still
    # save most of it
    assert t_warm < t_cold, (t_cold, t_warm)


def test_host_encode_decode_roundtrip(host_bin, artifact, tmp_path):
    """encode -> raw f32 latents -> decode through the C++ host, checked
    against the Python AOT replay of the same schedule."""
    from jax import export as jex
    from scipy.io import wavfile

    manifest = json.loads((artifact / "manifest.json").read_text())
    block = manifest["block_size"]
    sr = manifest["sampling_rate"]
    L = manifest["latent_size"]
    n_blocks = 2
    rng = np.random.default_rng(1)
    sig = 0.3 * rng.standard_normal(n_blocks * block)
    x_host = _write_wav(tmp_path / "in.wav", sig, sr)

    r = subprocess.run(
        [host_bin, str(artifact), "encode", str(tmp_path / "in.wav"),
         str(tmp_path / "z.f32"), "7"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    z_host = np.fromfile(tmp_path / "z.f32", dtype=np.float32).reshape(-1, L)

    enc = jex.deserialize((artifact / "encode_step.stablehlo").read_bytes())
    from rave_tpu.export.artifact import ExportedRAVE

    art = ExportedRAVE(str(artifact))
    state = {"cache": art.cache}
    zs = []
    for i in range(n_blocks):
        xb = jnp.asarray(
            x_host[i * block : (i + 1) * block].reshape(1, block, 1)
        )
        zb, state = enc.call(state, xb, jnp.uint32(7 + i))
        zs.append(np.asarray(zb)[0])
    z_py = np.concatenate(zs, axis=0)
    assert z_host.shape == z_py.shape
    np.testing.assert_allclose(z_host, z_py, atol=1e-4)

    # decode the host's latents back to audio through the host
    r = subprocess.run(
        [host_bin, str(artifact), "decode", str(tmp_path / "z.f32"),
         str(tmp_path / "resynth.wav"), "3"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    sr3, y = wavfile.read(tmp_path / "resynth.wav")
    assert sr3 == sr
    assert len(y) == n_blocks * block
    assert np.isfinite(y.astype(np.float32)).all()


@pytest.fixture(scope="module")
def adain_artifact(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("adain_run")
    from rave_tpu.export.export import export_model

    cfg = config_lib.compose(["v2", "causal", "adain"], TINY)
    cfg.data.n_signal = 8192
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=8192)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "config.json").write_text(config_lib.snapshot(cfg))
    save_checkpoint(str(run_dir), 1, jax.device_get(state))
    out = export_model(run=str(run_dir), streaming=True)
    return Path(out)


def test_host_adain_style_transfer(host_bin, adain_artifact, tmp_path):
    """The named-attribute surface on the C++ host (reference nn_tilde
    register_attribute, scripts/export.py:306-341): learn target stats,
    learn source stats, then stream with transfer active — three separate
    processes chained via --save-state/--load-state — matching the Python
    replay of the same AOT module, seeds, and attribute pokes."""
    from jax import export as jex
    from scipy.io import wavfile

    manifest = json.loads((adain_artifact / "manifest.json").read_text())
    assert manifest["attributes"] == [
        "learn_target", "reset_target", "learn_source", "reset_source"
    ]
    assert manifest["attribute_ops"]["learn_target"] == [
        {"leaf": "learn_y", "fill": None}
    ]
    spec = manifest["aot"]["forward_step"]
    assert len(spec["state_leaves"]) == spec["n_state"]
    assert any(p.endswith("/learn_y") for p in spec["state_leaves"])

    block, sr = manifest["block_size"], manifest["sampling_rate"]
    n_blocks = 2
    rng = np.random.default_rng(3)
    t = np.arange(n_blocks * block) / sr
    a = 0.5 * np.sin(2 * np.pi * 330 * t)
    b = 0.25 * rng.standard_normal(n_blocks * block)
    xa = _write_wav(tmp_path / "a.wav", a, sr)
    xb = _write_wav(tmp_path / "b.wav", b, sr)
    s1, s2 = tmp_path / "s1.bin", tmp_path / "s2.bin"

    def run(args):
        r = subprocess.run(
            [host_bin, *args], capture_output=True, text=True, timeout=600
        )
        assert r.returncode == 0, r.stderr

    art_p = str(adain_artifact)
    run(["--attr", "learn_target=1", "--save-state", str(s1), art_p,
         "forward", str(tmp_path / "a.wav"), str(tmp_path / "oa.wav"), "0"])
    run(["--load-state", str(s1), "--attr", "learn_target=0",
         "--attr", "learn_source=1", "--save-state", str(s2), art_p,
         "forward", str(tmp_path / "b.wav"), str(tmp_path / "ob.wav"), "10"])
    run(["--load-state", str(s2), "--attr", "learn_source=0", art_p,
         "forward", str(tmp_path / "b.wav"), str(tmp_path / "ot.wav"), "20"])
    run([art_p, "forward", str(tmp_path / "b.wav"),
         str(tmp_path / "op.wav"), "20"])

    _, y_t = wavfile.read(tmp_path / "ot.wav")
    y_t = y_t.astype(np.float32) / 32767.0
    _, y_p = wavfile.read(tmp_path / "op.wav")
    y_p = y_p.astype(np.float32) / 32767.0
    # run 3 has learned stats on both sides -> transfer active -> its output
    # differs from the same seeds with a fresh (stat-free) state
    assert np.max(np.abs(y_t - y_p)) > 1e-4

    # python replay: zero-init state, same pokes, same seed schedule
    fwd = jex.deserialize(
        (adain_artifact / "forward_step.stablehlo").read_bytes()
    )
    from rave_tpu.export.artifact import ExportedRAVE

    art = ExportedRAVE(art_p)
    state = {
        "adain": jax.tree_util.tree_map(
            jnp.zeros_like, art.variables["adain"]
        ),
        "cache": art.cache,
    }

    def fill(tree, suffix, value):
        def walk(d, path):
            if isinstance(d, dict):
                return {k: walk(v, f"{path}/{k}") for k, v in d.items()}
            return jnp.full_like(d, value) if path.endswith("/" + suffix) else d
        return walk(tree, "")

    def stream(state, x, seed_base):
        ys = []
        for i in range(n_blocks):
            xblk = jnp.asarray(x[i * block : (i + 1) * block].reshape(1, block, 1))
            yb, state = fwd.call(state, xblk, jnp.uint32(seed_base + i))
            ys.append(np.asarray(yb)[0, :, 0])
        return np.concatenate(ys), state

    state["adain"] = fill(state["adain"], "learn_y", 1.0)
    _, state = stream(state, xa, 0)
    state["adain"] = fill(state["adain"], "learn_y", 0.0)
    state["adain"] = fill(state["adain"], "learn_x", 1.0)
    _, state = stream(state, xb, 10)
    state["adain"] = fill(state["adain"], "learn_x", 0.0)
    y_py, _ = stream(state, xb, 20)
    np.testing.assert_allclose(y_t[: len(y_py)], y_py, atol=5e-4)


def test_host_prior_matches_python_aot(host_bin, tmp_path):
    """C++ prior sampling (AOT prior_step autoregression + the host's own
    QuantizedNormal/DiagonalShift decode) == the Python replay of the same
    modules and seed schedule (dither off on both sides)."""
    from jax import export as jex
    from scipy.special import erfinv

    from rave_tpu.export.export import export_model
    from rave_tpu.prior.model import Prior
    from rave_tpu.utils.checkpoint import save_checkpoint

    # a VAE run + a fabricated tiny prior run (prior D == artifact latent
    # size so no noise padding is involved)
    cfg = config_lib.compose(["v2", "causal"], TINY)
    cfg.data.n_signal = 8192
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=8192)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "config.json").write_text(config_lib.snapshot(cfg))
    save_checkpoint(str(run_dir), 1, jax.device_get(state))

    pcfg = dict(
        latent_size=2, resolution=8, res_size=8, skp_size=8,
        kernel_size=3, cycle_size=2, n_layers=2,
    )
    prior = Prior(**pcfg)
    x0 = jnp.zeros((1, 4, pcfg["resolution"] * pcfg["latent_size"]))
    pv = jax.jit(prior.init)({"params": jax.random.key(1)}, x0)
    prior_dir = tmp_path / "prior_run"
    prior_dir.mkdir()
    (prior_dir / "prior_config.json").write_text(json.dumps(pcfg))
    save_checkpoint(
        str(prior_dir), 1, jax.device_get({"params": pv["params"], "opt": {}})
    )

    out = Path(export_model(
        run=str(run_dir), streaming=True, prior=str(prior_dir),
    ))
    manifest = json.loads((out / "manifest.json").read_text())
    assert "error" not in manifest["aot"]["prior_step"], (
        manifest["aot"]["prior_step"]
    )

    n_frames, seed_base = 6, 11
    r = subprocess.run(
        [host_bin, "--no-dither", str(out), "prior", str(n_frames),
         str(tmp_path / "zp.f32"), str(seed_base)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    L = manifest["latent_size"]
    z_host = np.fromfile(tmp_path / "zp.f32", dtype=np.float32).reshape(-1, L)
    assert z_host.shape == (n_frames, L)

    # python replay: same AOT module, same seeds, same decode math
    D, R = pcfg["latent_size"], pcfg["resolution"]
    ps = jex.deserialize((out / "prior_step.stablehlo").read_bytes())
    cache = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype),
        jax.eval_shape(
            lambda: prior.init(
                {"params": jax.random.key(0)}, jnp.zeros((1, 1, D * R))
            )
        ).get("cache", {}),
    )
    x = jnp.zeros((1, 1, D * R))
    ys = []
    for i in range(n_frames + D - 1):
        x, cache = ps.call(cache, x, jnp.uint32(seed_base + i))
        ys.append(np.asarray(x)[0, 0])
    ys = np.stack(ys)  # [steps, D*R] one-hots
    idx = ys.reshape(-1, D, R).argmax(-1)  # [steps, D]
    q = idx.astype(np.float64) / R
    dec = np.clip(erfinv(2 * q - 1) * np.sqrt(2), -4, 4)
    z_py = np.stack(
        [[dec[t + d, d] for d in range(D)] for t in range(n_frames)]
    )
    M = min(D, L)  # host truncates/pads the prior's width to the artifact's
    np.testing.assert_allclose(z_host[:, :M], z_py[:, :M], atol=1e-4)
