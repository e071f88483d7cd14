"""Orbax-backed checkpointing with run discovery.

The Lightning-.ckpt equivalent (SURVEY.md §5): the full RaveTrainState
(params + both optimizers + mutable model state + EMA) plus the resolved
config snapshot next to it; run discovery keeps the reference's
newest-checkpoint semantics (rave/core.py:84-122).
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(run_dir: str, step: int, state: Any):
    path = Path(run_dir).absolute() / "checkpoints" / f"step_{step:010d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def list_checkpoints(run_dir: str):
    d = Path(run_dir).absolute() / "checkpoints"
    if not d.exists():
        return []
    return sorted(p for p in d.iterdir() if p.name.startswith("step_"))


def latest_checkpoint(run_dir: str, step: Optional[int] = None) -> Optional[Path]:
    """Newest checkpoint, or the one at exactly `step` when given."""
    ckpts = list_checkpoints(run_dir)
    if step is not None:
        want = f"step_{step:010d}"
        hits = [p for p in ckpts if p.name == want]
        if not hits:
            raise FileNotFoundError(
                f"no checkpoint at step {step} under {run_dir} "
                f"(available: {[int(p.name.split('_')[-1]) for p in ckpts]})"
            )
        return hits[0]
    return ckpts[-1] if ckpts else None


def restore_checkpoint(run_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore the newest checkpoint (or the one at `step`) into `target`'s
    structure."""
    path = latest_checkpoint(run_dir, step)
    if path is None:
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def search_for_run(path: Optional[str]) -> Optional[str]:
    """Find the run directory holding the newest checkpoints under `path`
    (reference rave/core.py:114-122)."""
    if path is None:
        return None
    p = Path(path)
    if (p / "checkpoints").exists():
        return str(p)
    candidates = sorted(
        p.rglob("checkpoints"), key=lambda d: os.path.getmtime(d)
    )
    if candidates:
        return str(candidates[-1].parent)
    return None


def search_for_config(run_dir: str) -> Optional[str]:
    """config.json discovery (reference rave/core.py:97-110)."""
    p = Path(run_dir)
    if p.is_file():
        p = p.parent
    for cand in [p, p.parent, p.parent.parent]:
        c = cand / "config.json"
        if c.exists():
            return str(c)
    hits = list(p.rglob("config.json"))
    return str(hits[0]) if hits else None
