"""Build + locate the native C++ artifact host (native/rtpu_host.cc).

rtpu_host is the framework's nn~/VST analog (reference scripts/export.py:586
and the out-of-repo nn_tilde C++ consumers): a Python-free binary that
compiles the .rtpu artifact's AOT StableHLO modules through the PJRT C++
API (XLA:CPU linked from the TensorFlow wheel's libtensorflow_cc) and
streams audio block by block.

The binary is compiled on demand with g++ and cached next to the source.
Requirements: g++ and an installed `tensorflow` wheel (headers + libs). The
build matches the wheel's ABI: C++17, libstdc++, and -DNDEBUG (TF ships
release binaries; tsl::AsyncValue's layout changes under NDEBUG, so a debug
build corrupts PJRT futures — discovered the hard way, see DEVNOTES.md).
"""
from __future__ import annotations

import importlib.util
import subprocess
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "rtpu_host.cc"
_BIN = _NATIVE_DIR / "rtpu_host"


def tensorflow_dir() -> Optional[Path]:
    spec = importlib.util.find_spec("tensorflow")
    if spec is None or not spec.submodule_search_locations:
        return None
    return Path(spec.submodule_search_locations[0])


def build_command(tf: Path) -> list:
    inc = tf / "include"
    return [
        "g++", "-std=c++17", "-O2", "-DNDEBUG",
        "-I", str(_NATIVE_DIR / "mlir_stub"),
        "-I", str(inc),
        "-I", str(inc / "external" / "highwayhash"),
        "-I", str(inc / "external" / "farmhash_archive" / "src"),
        "-o", str(_BIN), str(_SRC),
        "-L", str(tf),
        "-l:libtensorflow_cc.so.2", "-l:libtensorflow_framework.so.2",
        "-ldl", f"-Wl,-rpath,{tf}",
    ]


def ensure_host(timeout: float = 1200.0, force: bool = False) -> Optional[str]:
    """Path to the rtpu_host binary, building it if needed. None when the
    toolchain or the TensorFlow wheel is unavailable."""
    if not _SRC.exists():
        return None
    if (
        _BIN.exists()
        and not force
        and _BIN.stat().st_mtime >= _SRC.stat().st_mtime
    ):
        return str(_BIN)
    tf = tensorflow_dir()
    if tf is None or not (tf / "libtensorflow_cc.so.2").exists():
        return None
    try:
        subprocess.run(
            build_command(tf),
            check=True,
            capture_output=True,
            timeout=timeout,
        )
    except Exception:
        return None
    return str(_BIN) if _BIN.exists() else None


if __name__ == "__main__":
    path = ensure_host(force=True)
    print(path or "build failed")
