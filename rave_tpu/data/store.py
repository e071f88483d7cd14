"""ARS — a flat mmap'd audio record store (the lmdb+protobuf equivalent).

The reference stores fixed-size int16 protobuf AudioExamples in lmdb keyed
'%08d' (SURVEY.md §2.11). Here records are fixed-size, so the store is a
raw little-endian int16 payload file + a JSON header — O(1) random access
through the OS page cache with zero deserialization, and trivially
mmap-able from the C++ sampler (native/ars_pipeline.cc).

Layout:
    <db>/metadata.yaml   {lazy, channels, n_seconds, sr, num_signal, n_examples}
    <db>/data.ars        raw int16, record i at i * num_signal * channels * 2
Lazy mode instead writes entries.json: [{path, length_samples}] and decodes
slices on demand via ffmpeg.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional

import numpy as np
import yaml


class ArsWriter:
    def __init__(self, db_path: str, num_signal: int, channels: int, sr: int):
        self.db = Path(db_path)
        self.db.mkdir(parents=True, exist_ok=True)
        self.num_signal = num_signal
        self.channels = channels
        self.sr = sr
        self.n = 0
        self._f = open(self.db / "data.ars", "wb")

    def append(self, chunk: np.ndarray):
        """chunk int16 [num_signal, channels]."""
        assert chunk.shape == (self.num_signal, self.channels), chunk.shape
        self._f.write(np.ascontiguousarray(chunk, dtype="<i2").tobytes())
        self.n += 1

    def close(self):
        self._f.close()
        meta = {
            "lazy": False,
            "channels": self.channels,
            "n_seconds": self.n * self.num_signal / self.sr,
            "sr": self.sr,
            "num_signal": self.num_signal,
            "n_examples": self.n,
        }
        with open(self.db / "metadata.yaml", "w") as f:
            yaml.safe_dump(meta, f)


class ArsReader:
    def __init__(self, db_path: str):
        self.db = Path(db_path)
        with open(self.db / "metadata.yaml") as f:
            self.meta = yaml.safe_load(f)
        self.num_signal = self.meta["num_signal"]
        self.channels = self.meta["channels"]
        rec = self.num_signal * self.channels
        self._mm = np.memmap(self.db / "data.ars", dtype="<i2", mode="r")
        self.n = len(self._mm) // rec
        self._rec = rec

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> np.ndarray:
        rec = self._mm[i * self._rec : (i + 1) * self._rec]
        return np.asarray(rec).reshape(self.num_signal, self.channels)


def read_metadata(db_path: str) -> dict:
    with open(Path(db_path) / "metadata.yaml") as f:
        return yaml.safe_load(f)


def get_training_channels(db_path: str, target: Optional[int] = None) -> int:
    """Channel inference from dataset metadata (reference
    rave/dataset.py:163-172, scripts/train.py:139-140)."""
    meta = read_metadata(db_path)
    data_channels = meta.get("channels", 1)
    if target is None:
        return data_channels
    if target > data_channels:
        raise ValueError(
            f"requested {target} channels but dataset has {data_channels}"
        )
    return target
