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
):
    from rave_tpu.export.artifact import ExportedRAVE

    p = Path(model)
    if not (p / "manifest.json").exists():
        # run directory -> export on the fly
        from rave_tpu.export.export import export_model

        p = Path(export_model(run=model, streaming=streaming))
    art = ExportedRAVE(str(p))
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
