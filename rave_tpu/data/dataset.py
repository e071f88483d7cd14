"""Datasets over the ARS store + the transform pipeline.

Capability parity with rave/dataset.py: AudioDataset (preprocessed chunks),
LazyAudioDataset (path+length index, ffmpeg seek decode), HTTPAudioDataset
(remote REST), get_dataset transform composition (rave/dataset.py:206-261)
and the seeded 98/2 split (rave/dataset.py:264-278).
"""
from __future__ import annotations

import base64
import json
import math
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
import yaml

from rave_tpu.data import transforms as T
from rave_tpu.data.audio_io import decode_slice_ffmpeg
from rave_tpu.data.store import ArsReader


class AudioDataset:
    """Preprocessed fixed-size chunks -> float32 [T, C]
    (reference rave/dataset.py:32-83)."""

    def __init__(self, db_path: str, transform: Optional[T.Transform] = None):
        self.reader = ArsReader(db_path)
        self.transform = transform

    def __len__(self):
        return len(self.reader)

    def get(self, i: int, rng: np.random.Generator) -> np.ndarray:
        x = self.reader[i].astype(np.float32) / 32767.0
        if self.transform is not None:
            x = self.transform(rng, x)
        return x


class LazyAudioDataset:
    """Path-indexed dataset decoding slices on demand via ffmpeg
    (reference rave/dataset.py:87-160)."""

    def __init__(
        self, db_path: str, n_signal: int, transform: Optional[T.Transform] = None
    ):
        self.db = Path(db_path)
        with open(self.db / "metadata.yaml") as f:
            self.meta = yaml.safe_load(f)
        with open(self.db / "entries.json") as f:
            self.entries = json.load(f)
        self.sr = self.meta["sr"]
        self.channels = self.meta["channels"]
        self.n_signal = n_signal
        counts = [max(e["length"] // n_signal, 0) for e in self.entries]
        self.index = np.cumsum([0] + counts)
        self.transform = transform

    def __len__(self):
        return int(self.index[-1])

    def get(self, i: int, rng: np.random.Generator) -> np.ndarray:
        f = int(np.searchsorted(self.index, i, side="right") - 1)
        chunk = i - self.index[f]
        start_sec = chunk * self.n_signal / self.sr
        x = decode_slice_ffmpeg(
            self.entries[f]["path"], start_sec, self.n_signal, self.sr, self.channels
        ).astype(np.float32) / 32767.0
        if self.transform is not None:
            x = self.transform(rng, x)
        return x


class HTTPAudioDataset:
    """Remote dataset over the REST protocol served by
    `rave_tpu remote_dataset` (reference rave/dataset.py:174-193)."""

    def __init__(self, host: str, transform: Optional[T.Transform] = None):
        from urllib.request import urlopen

        self._urlopen = urlopen
        self.host = host.rstrip("/")
        self.length = int(json.loads(self._get("/len"))["length"])
        self.transform = transform

    def _get(self, route: str) -> bytes:
        with self._urlopen(self.host + route) as r:
            return r.read()

    def __len__(self):
        return self.length

    def get(self, i: int, rng: np.random.Generator) -> np.ndarray:
        payload = json.loads(self._get(f"/get/{i}"))
        raw = base64.b64decode(payload["data"])
        x = (
            np.frombuffer(raw, dtype="<i2")
            .reshape(-1, payload["channels"])
            .astype(np.float32)
            / 32767.0
        )
        if self.transform is not None:
            x = self.transform(rng, x)
        return x


def get_dataset(
    db_path: str,
    sr: int,
    n_signal: int,
    derivative: bool = False,
    normalize: bool = False,
    rand_pitch=None,
    augmentations: Sequence[str] = (),
    n_channels: Optional[int] = None,
):
    """Build the transform pipeline + dataset (reference rave/dataset.py:206-261):
    RandomCrop -> RandomApply(phase mangle, .8) -> Dequantize(16)
    [-> RandomPitch] [-> Resample] [-> Normalize] [-> Derivator] [-> augs].
    """
    if str(db_path).startswith("http"):
        meta = {"sr": sr, "lazy": False}
    else:
        with open(Path(db_path) / "metadata.yaml") as f:
            meta = yaml.safe_load(f)

    pipeline: List[T.Transform] = [T.RandomCrop(n_signal)]
    if rand_pitch:
        pipeline.append(
            T.RandomPitch(n_signal, max_factor=rand_pitch)
            if not isinstance(rand_pitch, (list, tuple))
            else T.RandomPitch(n_signal, max_factor=max(rand_pitch))
        )
    pipeline += [
        T.RandomApply(T.PhaseMangle(min_f=20, max_f=2000, amplitude=0.99, sr=sr), p=0.8),
        T.Dequantize(16),
    ]
    if meta.get("sr", sr) != sr:
        pipeline.append(T.Resample(meta["sr"], sr))
    if normalize:
        pipeline.append(T.Normalize())
    if derivative:
        pipeline.append(T.Derivator())
    pipeline += T.get_augmentations(augmentations, sr)
    transform = T.Compose(*pipeline)

    if str(db_path).startswith("http"):
        return HTTPAudioDataset(db_path, transform)
    if meta.get("lazy", False):
        return LazyAudioDataset(db_path, n_signal, transform)
    return AudioDataset(db_path, transform)


def split_dataset(dataset, percent: int = 98, max_residual: int = 1000, seed: int = 42):
    """Seeded 98/2 index split with a cap on the validation size
    (reference rave/dataset.py:264-278)."""
    n = len(dataset)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    split2 = min(n * (100 - percent) // 100, max_residual)
    split1 = n - split2
    return perm[:split1], perm[split1:]
