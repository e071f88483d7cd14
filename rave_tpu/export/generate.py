"""Offline batch file transformation through a trained model or artifact.

The `rave generate` equivalent (scripts/generate.py:33-123): decode input
audio, run forward (optionally simulating streaming by chunking), write
reconstructed wavs.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from rave_tpu.data.audio_io import decode_file


def generate(
    model: str,
    inputs: Sequence[str],
    out_path: str = "generated",
    streaming: bool = False,
    chunk_size: Optional[int] = None,
    prior_seconds: float = 0.0,
    prior_samples: int = 1,
    seed: int = 0,
):
    from rave_tpu.export.artifact import ExportedRAVE

    p = Path(model)
    if not (p / "manifest.json").exists():
        # run directory -> export on the fly
        from rave_tpu.export.export import export_model

        p = Path(export_model(run=model, streaming=streaming))
    art = ExportedRAVE(str(p))
    if prior_seconds:
        return _generate_prior(
            art, out_path, prior_seconds, prior_samples, seed
        )
    sr = art.manifest.get("target_sampling_rate", art.manifest["sampling_rate"])
    block = chunk_size or art.block_size
    if streaming and block % art.block_size != 0:
        raise ValueError(
            f"--chunk_size must be a multiple of the artifact's block size "
            f"{art.block_size} (got {block})"
        )
    out_dir = Path(out_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    integrator = None
    if art.manifest.get("derivative"):
        # derivative-trained model: integrate the output back to the signal
        # domain (reference scripts/train.py:160-161, rave/dataset.py:24-29)
        from rave_tpu.data.transforms import get_derivator_integrator

        integrator = get_derivator_integrator(sr)[1]

    for f in inputs:
        x = decode_file(f, sr, art.n_channels)
        if x is None:
            print(f"skipping {f} (cannot decode)")
            continue
        assert x.dtype == np.int16, (
            f"decode_file contract violated: expected int16, got {x.dtype}"
        )
        x = x.astype(np.float32) / 32768.0
        n_in = x.shape[0]
        # whole-file processing (reference scripts/generate.py:91-115): pad
        # the trailing partial block with zeros, trim the output back
        pad = (-n_in) % block
        if pad:
            x = np.pad(x, ((0, pad), (0, 0)))
        T = x.shape[0]
        xb = jnp.asarray(x[None])
        if streaming:
            art.reset_stream()
            outs = []
            for i in range(0, T, block):
                outs.append(
                    np.asarray(art.forward(xb[:, i : i + block], streaming=True))
                )
            y = np.concatenate(outs, axis=1)[0]
        else:
            y = np.asarray(art.forward(xb))[0]
        y = y[:n_in]
        if integrator is not None:
            y = integrator(y)
        y = np.clip(y, -1, 1)
        out_file = out_dir / (Path(f).stem + "_reconstructed.wav")
        wavfile.write(out_file, sr, (y * 32767).astype(np.int16))
        print(f"wrote {out_file}")


def _generate_prior(art, out_path, seconds: float, n: int, seed: int):
    """Unconditional generation: sample latents from the bundled
    autoregressive prior and decode to audio (the reference's prior
    surface lives in the nn~ 'prior' method, export.py:543-558)."""
    import jax

    if not art.has_prior:
        raise RuntimeError(
            f"{art.path} was exported without a prior — re-export with "
            "`rave-tpu export --prior <prior_run_dir>`"
        )
    sr = art.manifest.get("target_sampling_rate", art.manifest["sampling_rate"])
    # latent frame rate = model sr / decimation (the decode method consumes
    # one latent frame per `decimation` output samples)
    decim = art.manifest["methods"]["decode"]["in_ratio"]
    n_frames = max(int(round(seconds * art.manifest["sampling_rate"] / decim)), 1)
    out_dir = Path(out_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        z = art.sample_prior(n_frames, rng=jax.random.key(seed + i))
        y = np.asarray(art.decode(z))[0]
        y = np.clip(y, -1, 1)
        out_file = out_dir / f"prior_sample_{i}.wav"
        wavfile.write(out_file, sr, (y * 32767).astype(np.int16))
        print(f"wrote {out_file} ({y.shape[0] / sr:.2f}s)")
