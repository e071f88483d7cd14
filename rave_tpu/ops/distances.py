"""Audio reconstruction distances over multiscale spectrograms.

Reference: rave/core.py:322-490 (AudioDistanceV1, instantaneous-frequency
distance, Encodec-style distance, generic SpectralDistance).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.ops.dsp import mean_difference
from rave_tpu.ops.stft import MultiScaleSTFT, mel_filterbank, spectrogram


@dataclass(frozen=True)
class AudioDistanceV1:
    """Relative-L2 linear + L1 log spectral distance, summed over scales.

    Reference: rave/core.py:322-344.
    """

    multiscale_stft: MultiScaleSTFT
    log_epsilon: float = 1e-7

    def __call__(self, x: jax.Array, y: jax.Array) -> dict:
        sx = self.multiscale_stft(x)
        sy = self.multiscale_stft(y)
        distance = 0.0
        for a, b in zip(sx, sy):
            lin = mean_difference(a, b, norm="L2", relative=True)
            log = mean_difference(
                jnp.log(a + self.log_epsilon),
                jnp.log(b + self.log_epsilon),
                norm="L1",
            )
            distance = distance + lin + log
        return {"spectral_distance": distance}


def _unwrap_if(phase: jax.Array) -> jax.Array:
    """Phase -> instantaneous frequency (reference rave/core.py:356-368)."""
    d = phase[..., 1:] - phase[..., :-1]
    d = (d + np.pi) % (2 * np.pi) - np.pi
    unwrapped = jnp.cumsum(d, axis=-1)
    return unwrapped[..., 1:] - unwrapped[..., :-1]


@dataclass(frozen=True)
class WeightedInstantaneousSpectralDistance:
    """Amplitude + instantaneous-frequency distance on complex STFTs.

    Reference: rave/core.py:347-412. The MultiScaleSTFT must be built with
    magnitude=False.
    """

    multiscale_stft: MultiScaleSTFT
    weighted: bool = False

    def __call__(self, target: jax.Array, pred: jax.Array) -> dict:
        sx = self.multiscale_stft(target)
        sy = self.multiscale_stft(pred)
        spectral = 0.0
        phase = 0.0
        for a, b in zip(sx, sy):
            ca = jax.lax.complex(a[..., 0], a[..., 1])
            cb = jax.lax.complex(b[..., 0], b[..., 1])
            xa, yb = jnp.abs(ca), jnp.abs(cb)
            spectral = (
                spectral
                + mean_difference(xa, yb, norm="L2", relative=True)
                + mean_difference(jnp.log1p(xa), jnp.log1p(yb), norm="L1")
            )
            fa = _unwrap_if(jnp.angle(ca))
            fb = _unwrap_if(jnp.angle(cb))
            if self.weighted:
                mask = jnp.clip(jnp.log1p(xa[..., 2:]), 0, 1)
                fa, fb = fa * mask, fb * mask
            phase = phase + mean_difference(fa, fb, norm="L2")
        return {"spectral_distance": spectral, "phase_distance": phase}


@dataclass(frozen=True)
class WaveformDistance:
    """Mean L1/L2 sample distance (reference rave/core.py:436-443)."""

    norm: str = "L1"

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return mean_difference(y, x, self.norm)


@dataclass(frozen=True)
class SpectralDistance:
    """Single-resolution (mel-)spectrogram distance
    (reference rave/core.py:446-490)."""

    n_fft: int
    sampling_rate: int
    norm: Tuple[str, ...] = ("L1",)
    power: Optional[float] = 1.0
    normalized: bool = True
    mel: Optional[int] = None

    def _spec(self, x: jax.Array) -> jax.Array:
        if x.ndim == 3:  # [B, T, C] channels-last -> [(B*C), T]
            x = x.swapaxes(1, 2).reshape(-1, x.shape[1])
        s = spectrogram(
            x,
            self.n_fft,
            self.n_fft // 4,
            power=None,
            center=False,
            normalized=self.normalized,
        )
        mag = jnp.abs(s)
        if self.mel is not None:
            fb = jnp.asarray(
                mel_filterbank(self.sampling_rate, self.n_fft, self.mel),
                dtype=mag.dtype,
            )
            mag = jnp.einsum("btf,mf->btm", mag, fb)
        if self.power == 2.0:
            mag = mag**2
        return mag

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        sx, sy = self._spec(x), self._spec(y)
        d = 0.0
        for n in self.norm:
            d = d + mean_difference(sy, sx, n)
        return d


@dataclass(frozen=True)
class EncodecAudioDistance:
    """L1 waveform + multi-resolution spectral distance
    (reference rave/core.py:415-433)."""

    scales: Tuple[int, ...]
    sampling_rate: int
    n_mels: Tuple[int, ...] = ()

    def __call__(self, x: jax.Array, y: jax.Array) -> dict:
        wave = WaveformDistance("L1")(x, y)
        spec = 0.0
        for i, scale in enumerate(self.scales):
            mel = self.n_mels[i] if self.n_mels else None
            spec = spec + SpectralDistance(
                n_fft=scale,
                sampling_rate=self.sampling_rate,
                norm=("L1", "L2"),
                mel=mel,
            )(x, y)
        return {"waveform_distance": wave, "spectral_distance": spec}
