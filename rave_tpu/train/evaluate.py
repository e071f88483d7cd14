"""Offline model evaluation: reconstruction metrics over a dataset split.

Beyond-reference tooling (the reference has no eval command): computes the
same spectral distance the trainer logs as `validation`
(reference rave/model.py:426-443) plus a waveform L1, for any run
directory — so an imported PyTorch checkpoint (`rave-tpu import_torch`),
a resumed run, and an EMA shadow can be compared on equal footing.

Usage (CLI): rave-tpu eval --run runs/myrun_* --db_path ./db [--split val]
Prints one JSON line: {"spectral_distance": ..., "waveform_l1": ...,
"n_clips": ..., "split": ..., "step": ...}.
"""
from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(
    run: str,
    db_path: str,
    split: str = "val",
    batch: Optional[int] = None,
    n_signal: Optional[int] = None,
    max_batches: Optional[int] = None,
    use_ema: bool = False,
    seed: int = 0,
    step: Optional[int] = None,
) -> dict:
    """Mean reconstruction metrics of a run's newest checkpoint (or the
    checkpoint at exactly `step`) over the chosen split ('val' = the
    training 98/2 holdout, 'train', or 'all')."""
    jax.devices()  # backend init before any torch import (DEVNOTES.md)
    from rave_tpu.data.dataset import get_dataset, split_dataset
    from rave_tpu.data.loader import Loader
    from rave_tpu.export.export import load_run
    from rave_tpu.factory import build_audio_distance, build_rave
    from rave_tpu.utils.checkpoint import latest_checkpoint

    cfg, params, model_state, n_channels, run_dir = load_run(run, use_ema, step)
    if batch:
        cfg.data.batch = batch
    if n_signal:
        cfg.data.n_signal = n_signal

    dataset = get_dataset(
        db_path,
        cfg.sampling_rate,
        cfg.data.n_signal,
        derivative=cfg.data.derivative,
        normalize=cfg.data.normalize,
    )
    train_idx, val_idx = split_dataset(dataset)
    indices = {"val": val_idx, "train": train_idx,
               "all": list(train_idx) + list(val_idx)}[split]
    if not len(indices):
        raise ValueError(f"split '{split}' of {db_path} is empty")
    loader = Loader(
        dataset, indices, min(cfg.data.batch, len(indices)), seed=seed,
        shuffle=False, drop_last=False,
    )

    model = build_rave(cfg, n_channels=n_channels, train=False)
    distance = build_audio_distance(cfg)

    # Fréchet mel distance (FMD): Fréchet distance between the Gaussian
    # fits of real vs reconstructed log-mel frame distributions — a
    # distribution-level realism metric in the spirit of FAD (Kilgour et
    # al. 2019) with log-mel frames as the embedding (no pretrained
    # network is available offline). Unlike the pairwise spectral
    # distance, it does not punish the adversarial phase for abandoning
    # per-sample fidelity, so it answers "is the GAN phase helping".
    from rave_tpu.ops.stft import mel_filterbank, spectrogram

    n_mels, n_fft, hop = 64, 1024, 256
    mel_fb = jnp.asarray(mel_filterbank(cfg.sampling_rate, n_fft, n_mels))

    def _mel_stats(sig):
        """log-mel frames -> (count, sum[n_mels], outer-sum[n_mels^2])."""
        s = spectrogram(sig[..., 0], n_fft, hop)  # [B, F, bins]
        m = jnp.log(jnp.einsum("bfk,mk->bfm", s, mel_fb) + 1e-5)
        flat = m.reshape(-1, n_mels)
        return (
            flat.shape[0],
            jnp.sum(flat, axis=0),
            flat.T @ flat,
        )

    @jax.jit
    def eval_step(x, rng):
        variables = {"params": params, **model_state}

        def run_fn(mdl):
            x_enc = mdl.transform_input(x)
            z = mdl.encoder(x_enc)
            zs, _ = mdl.reparametrize(z)
            y = mdl.decode(zs)[:, : x.shape[1], :]
            d = distance(x, y)
            return (
                sum(d.values()),
                jnp.mean(jnp.abs(y - x)),
                _mel_stats(x),
                _mel_stats(y),
            )

        return model.apply(variables, rngs={"noise": rng}, method=run_fn)

    rng = jax.random.key(1234)
    spectral, wave, n_clips, n_batches = [], [], 0, 0
    stats = {
        "real": [0, np.zeros(n_mels), np.zeros((n_mels, n_mels))],
        "fake": [0, np.zeros(n_mels), np.zeros((n_mels, n_mels))],
    }
    for b, x in enumerate(loader.epoch(0)):
        if max_batches is not None and b >= max_batches:
            break
        xb = jnp.asarray(x)
        s, w, st_r, st_f = eval_step(xb, rng)
        # partial trailing batches change the jit shape; weight by size
        spectral.append((float(s), xb.shape[0]))
        wave.append((float(w), xb.shape[0]))
        for key, st in (("real", st_r), ("fake", st_f)):
            stats[key][0] += int(st[0])
            stats[key][1] += np.asarray(st[1], np.float64)
            stats[key][2] += np.asarray(st[2], np.float64)
        n_clips += xb.shape[0]
        n_batches += 1

    ckpt = latest_checkpoint(str(run_dir), step)
    step = int(str(ckpt.name).split("_")[-1]) if ckpt is not None else -1
    wmean = lambda acc: sum(v * n for v, n in acc) / max(n_clips, 1)
    return {
        "spectral_distance": round(wmean(spectral), 6),
        "waveform_l1": round(wmean(wave), 6),
        "frechet_mel_distance": round(_frechet(stats["real"], stats["fake"]), 6),
        "n_clips": n_clips,
        "n_batches": n_batches,
        "split": split,
        "step": step,
        "ema": bool(use_ema),
        "run": str(run_dir),
    }


def _frechet(real, fake) -> float:
    """Fréchet distance between two Gaussians given (count, sum, outer-sum)
    sufficient statistics: |mu1-mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^(1/2))."""
    import scipy.linalg

    out = []
    for n, s, o in (real, fake):
        n = max(n, 2)
        mu = s / n
        cov = o / n - np.outer(mu, mu)
        out.append((mu, cov))
    (mu1, c1), (mu2, c2) = out
    diff = float(np.sum((mu1 - mu2) ** 2))
    covmean = scipy.linalg.sqrtm(c1 @ c2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return diff + float(np.trace(c1) + np.trace(c2) - 2.0 * np.trace(covmean))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("rave-tpu eval")
    p.add_argument("--run", required=True, help="run directory")
    p.add_argument("--db_path", required=True)
    p.add_argument("--split", choices=("val", "train", "all"), default="val")
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--n_signal", type=int, default=0)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--ema_weights", action="store_true")
    p.add_argument(
        "--step", type=int, default=None,
        help="evaluate the checkpoint at exactly this step (default: newest);"
        " 0 is a valid explicit step (imported checkpoints land there)",
    )
    a = p.parse_args(argv)
    out = evaluate(
        a.run, a.db_path, split=a.split, batch=a.batch or None,
        n_signal=a.n_signal or None, max_batches=a.max_batches or None,
        use_ema=a.ema_weights, step=a.step,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
