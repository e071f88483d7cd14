"""Corpus -> ARS store preprocessing (the `rave preprocess` equivalent).

Reference: scripts/preprocess.py — ffmpeg decode into fixed num_signal
chunks via a worker pool, int16 records keyed sequentially, metadata.yaml;
lazy mode stores only paths + probed lengths.
"""
from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import yaml

from rave_tpu.data.audio_io import (
    decode_file,
    have_ffmpeg,
    load_audio_chunk_ffmpeg,
    probe_length,
    search_for_audios,
)
from rave_tpu.data.store import ArsWriter


def preprocess(
    input_path: str,
    output_path: str,
    num_signal: int = 131072,
    sampling_rate: int = 44100,
    channels: int = 1,
    lazy: bool = False,
    workers: int = 8,
) -> dict:
    audios = search_for_audios(input_path)
    if not audios:
        raise FileNotFoundError(f"no audio files under {input_path}")

    out = Path(output_path)
    out.mkdir(parents=True, exist_ok=True)

    if lazy:
        if not have_ffmpeg() and not all(
            a.lower().endswith(".wav") for a in audios
        ):
            raise RuntimeError(
                "lazy preprocessing requires ffmpeg/ffprobe for non-.wav "
                "inputs (.wav works ffmpeg-less via the mmap reader)"
            )
        entries = []
        dropped = []
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for path, (dur, ch) in zip(audios, pool.map(probe_length, audios)):
                if dur > 0:
                    entries.append(
                        {"path": str(path), "length": int(dur * sampling_rate)}
                    )
                else:
                    dropped.append(str(path))
        if dropped:
            # fail loudly: a file the probe rejects would otherwise fail
            # (or vanish) at training time — e.g. 24-bit PCM, which the
            # ffmpeg-less mmap reader cannot serve (ADVICE r4)
            msg = (
                f"lazy preprocess: {len(dropped)}/{len(audios)} files cannot "
                "be probed/mmap'd and were skipped:\n  "
                + "\n  ".join(dropped[:20])
                + ("\n  ..." if len(dropped) > 20 else "")
            )
            if not entries:
                raise RuntimeError(msg)
            print(f"WARNING: {msg}")
        with open(out / "entries.json", "w") as f:
            json.dump(entries, f, indent=1)
        meta = {
            "lazy": True,
            "channels": channels,
            "n_seconds": sum(e["length"] for e in entries) / sampling_rate,
            "sr": sampling_rate,
            "num_signal": num_signal,
            "n_examples": sum(e["length"] // num_signal for e in entries),
        }
        with open(out / "metadata.yaml", "w") as f:
            yaml.safe_dump(meta, f)
        return meta

    writer = ArsWriter(str(out), num_signal, channels, sampling_rate)

    def decode(path):
        chunks = []
        if have_ffmpeg():
            for c in load_audio_chunk_ffmpeg(path, num_signal, sampling_rate, channels):
                chunks.append(c)
        else:
            x = decode_file(path, sampling_rate, channels)
            if x is not None:
                n = x.shape[0] // num_signal
                for i in range(n):
                    chunks.append(x[i * num_signal : (i + 1) * num_signal])
        return chunks

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for chunks in pool.map(decode, audios):
            for c in chunks:
                writer.append(c)
    writer.close()
    with open(out / "metadata.yaml") as f:
        return yaml.safe_load(f)
