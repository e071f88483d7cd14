"""ctypes binding for the native ARS batch sampler (native/ars_pipeline.cc).

Builds the shared library on demand with g++ (cached next to the source);
falls back cleanly when no compiler is available — the numpy pipeline in
rave_tpu/data/loader.py remains the reference implementation.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libars.so"
_lib = None


def _build() -> bool:
    src = _NATIVE_DIR / "ars_pipeline.cc"
    if not src.exists():
        return False
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", str(_LIB_PATH), str(src), "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.ars_open.restype = ctypes.c_void_p
    lib.ars_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    lib.ars_len.restype = ctypes.c_int64
    lib.ars_len.argtypes = [ctypes.c_void_p]
    lib.ars_close.argtypes = [ctypes.c_void_p]
    lib.ars_sample_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


class NativeSampler:
    """Threaded mmap batch sampler: record fetch + random crop + int16->f32
    + dither + phase mangle, all in C++ outside the GIL."""

    def __init__(
        self,
        db_path: str,
        num_signal: int,
        channels: int,
        crop: int,
        sr: int,
        dither_bits: int = 16,
        mangle_p: float = 0.8,
        seed: int = 0,
    ):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ARS library unavailable")
        self.lib = lib
        data = Path(db_path) / "data.ars"
        self.handle = lib.ars_open(str(data).encode(), num_signal, channels)
        if not self.handle:
            raise RuntimeError(f"could not open {data}")
        self.crop = crop
        self.channels = channels
        self.sr = sr
        self.dither_bits = dither_bits
        self.mangle_p = mangle_p
        self.seed = seed

    def __len__(self):
        return int(self.lib.ars_len(self.handle))

    def sample(self, indices: np.ndarray, epoch_tag: int = 0) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self.crop, self.channels), dtype=np.float32)
        self.lib.ars_sample_batch(
            self.handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            self.crop,
            ctypes.c_uint64(self.seed),
            ctypes.c_uint64(epoch_tag),
            self.dither_bits,
            self.mangle_p,
            float(self.sr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def close(self):
        if self.handle:
            self.lib.ars_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
