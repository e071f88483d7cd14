"""Metrics logging: JSONL always; TensorBoard when torch is available.

Reference: TensorBoardLogger + per-step self.log of every loss component
(rave/model.py:416-424, scripts/train.py:243-246), plus the lmdb-backed
ProgressLogger side channel (rave/core.py:493-535) — here a plain JSON
status file external monitors can poll.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.dir = Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir=str(self.dir / "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), int(step))

    def log_text(self, tag: str, text: str, step: int = 0):
        if self.tb is not None:
            self.tb.add_text(tag, f"```\n{text}\n```", step)
        with open(self.dir / f"{tag}.txt", "w") as f:
            f.write(text)

    def log_audio(self, tag: str, audio, sr: int, step: int):
        if self.tb is not None:
            self.tb.add_audio(tag, audio.reshape(1, -1), step, sample_rate=sr)

    def update_status(self, **kw):
        """Poll-able progress side channel (ProgressLogger equivalent)."""
        status_path = self.dir / "status.json"
        cur = {}
        if status_path.exists():
            try:
                cur = json.loads(status_path.read_text())
            except Exception:
                cur = {}
        cur.update(kw)
        status_path.write_text(json.dumps(cur))


class Profiler:
    """Wall-clock stage profiler (reference rave/model.py:27-42) +
    jax.profiler trace hooks."""

    def __init__(self):
        self.ticks = [(time.time(), None)]

    def tick(self, msg: str):
        self.ticks.append((time.time(), msg))

    def __repr__(self):
        rep = ["=" * 60]
        for i in range(1, len(self.ticks)):
            dt = (self.ticks[i][0] - self.ticks[i - 1][0]) * 1000
            rep.append(f"{self.ticks[i][1]}: {dt:.2f}ms")
        rep.append("=" * 60)
        return "\n".join(rep)


def start_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax

    jax.profiler.stop_trace()
