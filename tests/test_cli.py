"""End-to-end test of the public CLI surface (rave_tpu/cli.py).

The reference pins its user contract through scripts/main_cli.py
subcommands (preprocess -> train -> export -> generate, README quick
start); this drives the same chain in-process on a tiny config:
corpus wavs -> ARS store -> 2-step smoke train -> .rtpu export ->
offline generate, asserting each stage's artifacts.

Marked slow: the train-step compile dominates on a cold XLA cache.
"""
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TINY_OVERRIDES = [
    "sampling_rate=22050",
    "capacity=2",
    "discriminator.capacity=2",
    "latent_size=4",
    "ratios=[4,4,2]",
    "dilations=[[1],[1],[1]]",
    # skip the receptive-field probe: its extra autograd compile dominates
    # wall time on the 1-core CI box and is covered by tests/test_train.py
    "train.valid_signal_crop=false",
]
SR = 22050
N_SIGNAL = 8192


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for i in range(3):
        t = np.arange(40 * N_SIGNAL // 3) / SR
        x = 0.4 * np.sin(2 * np.pi * (150 + 70 * i) * t)
        x += 0.05 * rng.standard_normal(t.size)
        wavfile.write(d / f"take_{i}.wav", SR, (x * 32767).astype(np.int16))
    return d


def _cli(args):
    from rave_tpu.cli import main

    assert main([str(a) for a in args]) == 0


def test_cli_full_pipeline(corpus, tmp_path):
    db = tmp_path / "db"
    runs = tmp_path / "runs"
    gen = tmp_path / "generated"

    # 1. preprocess: corpus -> ARS store + metadata.yaml
    _cli(["preprocess", "--input_path", corpus, "--output_path", db,
          "--num_signal", N_SIGNAL, "--sampling_rate", SR, "--channels", 1,
          "--workers", 2])
    assert (db / "metadata.yaml").exists()

    # 2. two-step smoke train through both the gen step and checkpointing
    args = ["train", "--config", "v2", "--config", "causal"]
    for o in TINY_OVERRIDES:
        args += ["--override", o]
    # batch must be a multiple of the data-mesh size (8-device CPU mesh)
    args += ["--name", "cli_smoke", "--db_path", db, "--out_path", runs,
             "--batch", 8, "--n_signal", N_SIGNAL, "--smoke_test",
             "--workers", 2, "--no_progress"]
    _cli(args)
    run_dirs = [p for p in runs.iterdir() if p.is_dir()]
    assert len(run_dirs) == 1
    run_dir = run_dirs[0]
    assert (run_dir / "config.json").exists()
    assert any(run_dir.glob("checkpoints/*")), "no checkpoint written"

    # 3. export -> .rtpu artifact with manifest + AOT modules
    _cli(["export", "--run", run_dir, "--streaming"])
    artifacts = list(run_dir.glob("*.rtpu"))
    assert len(artifacts) == 1
    manifest = json.loads((artifacts[0] / "manifest.json").read_text())
    assert manifest["sampling_rate"] == SR
    for m in ("encode_step", "decode_step", "forward_step"):
        assert "error" not in manifest["aot"][m], manifest["aot"][m]

    # 4. generate: reconstruct a corpus file through the artifact
    wav_in = next(iter(corpus.glob("*.wav")))
    _cli(["generate", "--model", artifacts[0], "--input", wav_in,
          "--out_path", gen])
    outs = list(Path(gen).glob("*.wav"))
    assert len(outs) == 1
    from scipy.io import wavfile

    sr_out, y = wavfile.read(outs[0])
    assert sr_out == SR
    assert y.size > 0 and np.isfinite(y.astype(np.float32)).all()
    # whole-file generate (reference scripts/generate.py:91-115): the corpus
    # length is NOT a block multiple — the trailing partial block must be
    # processed (padded + trimmed), not dropped
    sr_in, x_in = wavfile.read(wav_in)
    assert x_in.shape[0] % 512 != 0, "corpus must exercise the partial block"
    assert y.shape[0] == x_in.shape[0], (
        f"generate dropped samples: {y.shape[0]} != {x_in.shape[0]}"
    )

    # 4b. eval: dataset-level reconstruction metrics of the run (beyond
    # the reference CLI); finite numbers over a real split
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        _cli(["eval", "--run", run_dir, "--db_path", db, "--split", "all",
              "--max_batches", 1, "--batch", 8])
    ev = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert ev["n_clips"] > 0 and ev["step"] >= 1
    assert np.isfinite(ev["spectral_distance"]) and ev["spectral_distance"] > 0
    assert np.isfinite(ev["waveform_l1"])

    # 5. resume: re-invoking train with the same name picks up the
    # checkpoint and advances the step counter (reference train.py:257-263)
    ckpts_before = {p.name for p in (run_dir / "checkpoints").iterdir()}
    _cli(args)
    run_dirs = [p for p in runs.iterdir() if p.is_dir()]
    assert len(run_dirs) == 1, "resume must reuse the run dir, not fork one"
    ckpts_after = {p.name for p in (run_dir / "checkpoints").iterdir()}
    assert ckpts_after - ckpts_before, "resumed run saved no new checkpoint"

    # 6. train a tiny latent prior on the frozen run (scripts/train_prior.py)
    _cli(["train_prior", "--run", run_dir, "--db_path", db, "--name", "p",
          "--out_path", runs, "--batch", 8, "--n_signal", N_SIGNAL,
          "--max_steps", 2, "--val_every", 100, "--resolution", 8,
          "--res_size", 16, "--skp_size", 16, "--n_layers", 2,
          "--cycle_size", 2, "--smoke_test"])
    prior_dir = runs / "p_prior"
    assert (prior_dir / "prior_config.json").exists()
    assert any(prior_dir.glob("checkpoints/*")), "prior saved no checkpoint"

    # 7. bundle the prior into a fresh export and generate unconditionally
    # (the reference's prior surface is nn~'s "prior" method,
    # reference rave/export.py TraceModel prior bundling)
    from scipy.io import wavfile

    _cli(["export", "--run", run_dir, "--streaming",
          "--prior", prior_dir, "--output", tmp_path / "art_prior"])
    art_prior = next((tmp_path / "art_prior").glob("*.rtpu"))
    assert json.loads((art_prior / "manifest.json").read_text())["prior"]
    _cli(["generate", "--model", art_prior, "--out_path", gen,
          "--prior_seconds", "0.25", "--prior_samples", "2", "--seed", "3"])
    for i in range(2):
        sr_p, y_p = wavfile.read(gen / f"prior_sample_{i}.wav")
        assert sr_p == SR
        assert y_p.shape[0] >= int(0.25 * SR)
