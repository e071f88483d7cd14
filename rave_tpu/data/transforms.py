"""Host-side (numpy) waveform transforms & augmentation registry.

Capability parity with rave/transforms.py: RandomCrop, phase mangling,
Dequantize, RandomPitch, Resample, Compose, RandomApply, RandomGain,
RandomMute, FrequencyMasking, Compress/RandomCompress (compand-style
compressor implemented in numpy since sox is not vendored), plus the
gin-style augmentation registry (rave/transforms.py:202-210).

All transforms map float32 [T, C] -> [T, C] given a numpy Generator.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
from scipy.signal import lfilter, resample_poly


class Transform:
    def __call__(self, rng: np.random.Generator, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class Compose(Transform):
    def __init__(self, *transforms):
        self.transforms = list(transforms)

    def __call__(self, rng, x):
        for t in self.transforms:
            x = t(rng, x)
        return x


class RandomApply(Transform):
    """Apply with probability p (reference rave/transforms.py:18-29)."""

    def __init__(self, transform: Transform, p: float = 0.5):
        self.transform = transform
        self.p = p

    def __call__(self, rng, x):
        if rng.random() < self.p:
            x = self.transform(rng, x)
        return x


class RandomCrop(Transform):
    """Random n_signal crop (reference rave/transforms.py:92-102)."""

    def __init__(self, n_signal: int):
        self.n_signal = n_signal

    def __call__(self, rng, x):
        if x.shape[0] <= self.n_signal:
            pad = self.n_signal - x.shape[0]
            return np.pad(x, ((0, pad), (0, 0)))
        start = rng.integers(0, x.shape[0] - self.n_signal + 1)
        return x[start : start + self.n_signal]


class Dequantize(Transform):
    """Add uniform dither at the source bit depth
    (reference rave/transforms.py:105-111)."""

    def __init__(self, bit_depth: int = 16):
        self.bit_depth = bit_depth

    def __call__(self, rng, x):
        return x + rng.random(x.shape).astype(x.dtype) / 2 ** (self.bit_depth - 1)


def random_angle(rng, min_f=20.0, max_f=8000.0, sr=24000):
    """Log-uniform angular frequency (reference rave/core.py:24-29)."""
    f = math.exp(rng.random() * (math.log(max_f) - math.log(min_f)) + math.log(min_f))
    return 2 * math.pi * f / sr


def pole_to_z_filter(omega, amplitude=0.9):
    """All-pass from a conjugate pole pair (reference rave/core.py:36-40)."""
    z0 = amplitude * np.exp(1j * omega)
    a = [1, -2 * np.real(z0), abs(z0) ** 2]
    b = [abs(z0) ** 2, -2 * np.real(z0), 1]
    return b, a


class PhaseMangle(Transform):
    """Random allpass phase mangling (reference rave/core.py:42-45,
    applied with p=.8 in rave/dataset.py:223-231)."""

    def __init__(self, min_f=20.0, max_f=2000.0, amplitude=0.99, sr=44100):
        self.min_f, self.max_f = min_f, max_f
        self.amplitude = amplitude
        self.sr = sr

    def __call__(self, rng, x):
        angle = random_angle(rng, self.min_f, self.max_f, self.sr)
        b, a = pole_to_z_filter(angle, self.amplitude)
        return lfilter(b, a, x, axis=0).astype(x.dtype)


class Resample(Transform):
    """Static integer-factor resample (reference rave/transforms.py:31-40)."""

    def __init__(self, orig_sr: int, target_sr: int):
        self.orig_sr, self.target_sr = orig_sr, target_sr

    def __call__(self, rng, x):
        g = math.gcd(self.orig_sr, self.target_sr)
        return resample_poly(
            x, self.target_sr // g, self.orig_sr // g, axis=0
        ).astype(x.dtype)


class RandomPitch(Transform):
    """Random rational pitch shift keeping length
    (reference rave/transforms.py:56-89)."""

    def __init__(self, n_signal: int, max_factor: float = 1.2):
        self.n_signal = n_signal
        self.max_factor = max_factor

    def __call__(self, rng, x):
        factor = self.max_factor ** (2 * rng.random() - 1)
        num = max(1, round(factor * 64))
        y = resample_poly(x, num, 64, axis=0).astype(x.dtype)
        if y.shape[0] < self.n_signal:
            y = np.pad(y, ((0, self.n_signal - y.shape[0]), (0, 0)))
        return y[: self.n_signal]


class RandomGain(Transform):
    """Random gain in dB, clipping-aware (reference rave/transforms.py:147-165;
    the reference's forward accidentally returns the un-gained tensor — here
    the gain is actually applied)."""

    def __init__(self, gain_range=(-6.0, 3.0)):
        self.gain_range = gain_range

    def __call__(self, rng, x):
        g = rng.uniform(*self.gain_range)
        amp = 10 ** (g / 20)
        peak = np.max(np.abs(x)) + 1e-9
        amp = min(amp, 1.0 / peak)
        return x * amp


class RandomMute(Transform):
    """Zero the example with probability p (reference rave/transforms.py:168-177)."""

    def __init__(self, p: float = 0.1):
        self.p = p

    def __call__(self, rng, x):
        if rng.random() < self.p:
            return np.zeros_like(x)
        return x


class FrequencyMasking(Transform):
    """Random band-stop via STFT masking (reference rave/transforms.py:180-195)."""

    def __init__(self, p: float = 0.5, n_fft: int = 1024, max_width: int = 128):
        self.p, self.n_fft, self.max_width = p, n_fft, max_width

    def __call__(self, rng, x):
        if rng.random() > self.p:
            return x
        T, C = x.shape
        hop = self.n_fft // 4
        pad = (-T) % hop
        xp = np.pad(x, ((0, pad + self.n_fft), (0, 0)))
        frames = np.lib.stride_tricks.sliding_window_view(xp, self.n_fft, axis=0)[
            ::hop
        ]  # [F, C, n_fft]
        win = np.hanning(self.n_fft)
        S = np.fft.rfft(frames * win, axis=-1)
        bins = S.shape[-1]
        f0 = rng.integers(0, bins)
        w = rng.integers(1, self.max_width)
        S[..., f0 : f0 + w] = 0
        rec = np.fft.irfft(S, axis=-1) * win
        out = np.zeros_like(xp)
        norm = np.zeros((xp.shape[0], 1))
        for i in range(rec.shape[0]):
            out[i * hop : i * hop + self.n_fft] += rec[i].T
            norm[i * hop : i * hop + self.n_fft, 0] += win**2
        out = out / np.maximum(norm, 1e-8)
        return out[:T].astype(x.dtype)


def _compand(x: np.ndarray, threshold_db: float, ratio: float = 4.0) -> np.ndarray:
    """Simple static compander curve (numpy stand-in for the reference's
    sox `compand` effect, rave/transforms.py:114-145)."""
    eps = 1e-9
    level_db = 20 * np.log10(np.abs(x) + eps)
    over = np.maximum(level_db - threshold_db, 0.0)
    gain_db = -over * (1 - 1 / ratio)
    return x * 10 ** (gain_db / 20)


class Compress(Transform):
    def __init__(self, threshold: float = -40.0, ratio: float = 4.0, sr: int = 44100):
        self.threshold, self.ratio = threshold, ratio

    def __call__(self, rng, x):
        return _compand(x, self.threshold, self.ratio).astype(x.dtype)


class RandomCompress(Transform):
    """Randomized-makeup compressor (reference rave/transforms.py:131-145)."""

    def __init__(
        self, threshold: float = -40.0, amp_range=(-60.0, -10.0),
        prob: float = 0.5, sr: int = 44100,
    ):
        self.threshold = threshold
        self.amp_range = amp_range
        self.prob = prob

    def __call__(self, rng, x):
        if rng.random() > self.prob:
            return x
        amp = rng.uniform(*self.amp_range)
        y = _compand(x, self.threshold)
        return (y * 10 ** (amp / 20)).astype(x.dtype)


class Derivator(Transform):
    """Leaky one-pole derivative (reference rave/dataset.py:24-29)."""

    def __call__(self, rng, x):
        return lfilter([1, -1], [1, -0.995], x, axis=0).astype(x.dtype)


class Normalize(Transform):
    def __call__(self, rng, x):
        return (x / (np.max(np.abs(x)) + 1e-9)).astype(x.dtype)


# ---- augmentation registry (reference rave/transforms.py:202-210) --------

_AUGMENTATIONS: Dict[str, Callable[[int], Transform]] = {
    "mute": lambda sr: RandomMute(p=0.1),
    "compress": lambda sr: RandomCompress(
        threshold=-40.0, amp_range=(-60.0, -10.0), prob=0.5, sr=sr
    ),
    "gain": lambda sr: RandomApply(RandomGain((-6.0, 3.0)), p=0.8),
}


def add_augmentation(name: str, factory: Callable[[int], Transform]):
    _AUGMENTATIONS[name] = factory


def get_augmentations(names: Sequence[str], sr: int) -> List[Transform]:
    return [_AUGMENTATIONS[n](sr) for n in names]
