"""Unit tests for `rave-tpu eval` (rave_tpu/train/evaluate.py).

Fast coverage of the options the migration guide advertises — split
selection, EMA shadow, max_batches — plus eval of an imported reference
checkpoint (the exact use docs/migration_guide.md documents), outside the
monolithic CLI chain test."""
import json

import jax
import numpy as np
import pytest
from scipy.io import wavfile

from rave_tpu import config as config_lib
from rave_tpu.factory import build_discriminator, build_rave
from rave_tpu.train.evaluate import evaluate
from rave_tpu.train.state import create_train_state
from rave_tpu.utils.checkpoint import save_checkpoint

TINY = [
    "capacity=2",
    "discriminator.capacity=2",
    "latent_size=4",
    "ratios=[4,4,2]",
    "dilations=[[1],[1],[1]]",
]
N_SIGNAL = 8192


@pytest.fixture(scope="module")
def db_and_run(tmp_path_factory):
    """A 57-record ARS db (56-train/1-val under the seeded 98/2 split,
    train split a multiple of batch 8) + a tiny fresh run with a distinct
    EMA shadow."""
    from rave_tpu.data.preprocess import preprocess

    root = tmp_path_factory.mktemp("evalfix")
    corpus = root / "corpus"
    corpus.mkdir()
    sr = 44100
    rng = np.random.default_rng(0)
    t = np.arange(57 * N_SIGNAL) / sr
    wav = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(len(t))
    wavfile.write(corpus / "a.wav", sr, (wav * 32767).astype(np.int16))
    preprocess(str(corpus), str(root / "db"), N_SIGNAL, sr, 1, workers=1)

    cfg = config_lib.compose(["v2"], TINY)
    cfg.data.n_signal = N_SIGNAL
    cfg.train.ema = 0.999  # declared in the snapshot so load_run restores it
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=N_SIGNAL)
    # a deliberately different EMA shadow so use_ema changes the metrics
    state = state.replace(
        ema_params=jax.tree_util.tree_map(lambda p: p * 0.5, state.gen_params)
    )
    run_dir = root / "run"
    run_dir.mkdir()
    (run_dir / "config.json").write_text(config_lib.snapshot(cfg))
    save_checkpoint(str(run_dir), 3, jax.device_get(state))
    return str(root / "db"), str(run_dir)


def test_eval_val_split(db_and_run):
    db, run = db_and_run
    out = evaluate(run, db, split="val")
    assert out["n_clips"] == 1  # 57 records -> 1 holdout
    assert out["split"] == "val" and out["step"] == 3 and out["ema"] is False
    assert np.isfinite(out["spectral_distance"]) and out["spectral_distance"] > 0
    assert np.isfinite(out["waveform_l1"]) and out["waveform_l1"] > 0
    # FMD: an untrained decoder's output distribution is far from the data
    assert np.isfinite(out["frechet_mel_distance"])
    assert out["frechet_mel_distance"] > 0.1
    json.dumps(out)  # one-JSON-line contract


def test_eval_train_split_and_max_batches(db_and_run):
    db, run = db_and_run
    out = evaluate(run, db, split="train", max_batches=2)
    assert out["n_batches"] == 2
    assert out["n_clips"] == 16  # batch 8, 56-record train split
    assert out["split"] == "train"


def test_eval_ema_shadow_differs(db_and_run):
    db, run = db_and_run
    plain = evaluate(run, db, split="val")
    ema = evaluate(run, db, split="val", use_ema=True)
    assert ema["ema"] is True
    assert ema["spectral_distance"] != plain["spectral_distance"]


def test_eval_deterministic(db_and_run):
    db, run = db_and_run
    a = evaluate(run, db, split="val")
    b = evaluate(run, db, split="val")
    assert a["spectral_distance"] == b["spectral_distance"]
    assert a["waveform_l1"] == b["waveform_l1"]


def test_eval_imported_checkpoint(db_and_run, tmp_path):
    """import_torch -> eval: a reference-layout .ckpt lands in a run dir
    that `rave-tpu eval` scores end-to-end (docs/migration_guide.md)."""
    torch = pytest.importorskip("torch")
    import functools
    import types

    from tests._reference_oracle import load_ref

    from rave_tpu.cli import cmd_import_torch

    rb = load_ref("rave/blocks.py", "refblocks_eval")
    rb.normalization = lambda m, mode="weight_norm": torch.nn.utils.weight_norm(m)
    cc0 = rb.cc
    ccb = types.SimpleNamespace(
        **{k: getattr(cc0, k) for k in dir(cc0) if not k.startswith("_")}
    )
    ccb.Conv1d = functools.partial(cc0.Conv1d, bias=False)
    ccb.ConvTranspose1d = functools.partial(cc0.ConvTranspose1d, bias=False)
    rb.cc = ccb

    torch.manual_seed(5)
    data = dict(capacity=4, ratios=[4, 2], latent_size=8, kernel_size=3,
                dilations=[[1, 3], [1]])
    tenc = rb.EncoderV2(data_size=16, n_out=2, **data)
    tgen = rb.GeneratorV2(data_size=16, amplitude_modulation=True, **data)
    sd = {}
    for k, v in tenc.state_dict().items():
        sd[f"encoder.encoder.{k}"] = v.detach()
    for k, v in tgen.state_dict().items():
        sd[f"decoder.{k}"] = v.detach()
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    cmd_import_torch([
        "--ckpt", str(ckpt), "--name", "imported", "--out_path",
        str(tmp_path / "runs"), "--config", "v2",
        "--override", "capacity=4", "--override", "latent_size=8",
        "--override", "ratios=[4,2]", "--override", "dilations=[[1,3],[1]]",
    ])
    run_dir = next((tmp_path / "runs").glob("imported_*"))

    db, _ = db_and_run
    out = evaluate(str(run_dir), db, split="val", n_signal=N_SIGNAL)
    assert np.isfinite(out["spectral_distance"]) and out["spectral_distance"] > 0
    assert out["step"] == 0  # imported checkpoints land at step 0


def test_eval_at_step(db_and_run, tmp_path):
    """--step selects an exact checkpoint (used to trace quality across a
    run's saved history); a missing step raises with the available list."""
    import shutil

    db, run = db_and_run
    run2 = tmp_path / "run2"
    shutil.copytree(run, run2)
    cfg = config_lib.compose(["v2"], TINY)
    cfg.data.n_signal = N_SIGNAL
    cfg.train.ema = 0.999
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(9), n_signal=N_SIGNAL)
    state = state.replace(
        ema_params=jax.tree_util.tree_map(lambda p: p * 0.5, state.gen_params)
    )
    save_checkpoint(str(run2), 7, jax.device_get(state))

    newest = evaluate(str(run2), db, split="val")
    at3 = evaluate(str(run2), db, split="val", step=3)
    assert newest["step"] == 7 and at3["step"] == 3
    assert at3["spectral_distance"] != newest["spectral_distance"]
    # the step-3 checkpoint is the same one the shared fixture run holds
    ref = evaluate(run, db, split="val")
    assert at3["spectral_distance"] == ref["spectral_distance"]
    with pytest.raises(FileNotFoundError, match="available"):
        evaluate(str(run2), db, split="val", step=4)


def test_frechet_gaussian_math():
    """_frechet on sufficient statistics: zero between identical
    distributions, the closed form |mu1-mu2|^2 for equal covariances, and
    symmetric in its arguments."""
    from rave_tpu.train.evaluate import _frechet

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4096, 8))
    stat = lambda d: [d.shape[0], d.sum(0), d.T @ d]
    assert abs(_frechet(stat(x), stat(x))) < 1e-6
    shifted = x + 2.0
    d = _frechet(stat(x), stat(shifted))
    # equal covariances: FD = |mu1 - mu2|^2 = 8 * 2^2
    assert abs(d - 32.0) < 0.1
    assert abs(d - _frechet(stat(shifted), stat(x))) < 1e-6
