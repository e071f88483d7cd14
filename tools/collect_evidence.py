"""Copy the committable evidence of a training run into the repo.

Checkpoints are orbax directories of full-size params+opt state (hundreds
of MB) and stay out of git; everything else a reviewer needs to audit a
run — the metrics stream, the config snapshot + hash, the model repr, the
TensorBoard event files, and any eval JSONs dropped next to the run — is
small and gets copied verbatim into a tracked directory (round 4's run
evidence lived in a gitignored path and was lost at the round boundary).

Usage: python tools/collect_evidence.py SRC_RUN_DIR DST_DIR
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

# checkpoints are orbax trees of full-size params (hundreds of MB);
# tb event files carry rendered audio summaries (tens of MB) whose scalar
# content is already in metrics.jsonl — both stay out of git, inventoried
SKIP = {"checkpoints", "tb"}


def collect(src: Path, dst: Path) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    for item in sorted(src.iterdir()):
        if item.name in SKIP:
            # record what existed without shipping it
            entries = sorted(
                f"{p.name}  {p.stat().st_size if p.is_file() else '<dir>'}"
                for p in item.iterdir()
            )
            (dst / f"{item.name}.txt").write_text("\n".join(entries) + "\n")
            continue
        if item.is_dir():
            shutil.copytree(item, dst / item.name, dirs_exist_ok=True)
        else:
            shutil.copy2(item, dst / item.name)
    print(f"collected {src} -> {dst}")


if __name__ == "__main__":
    collect(Path(sys.argv[1]), Path(sys.argv[2]))
