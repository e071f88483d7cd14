"""Spectral analysis: framed STFT, mel filterbanks, multiscale spectrograms.

TPU-first design notes:
  * Framing uses `lax.conv_general_dilated_patches` (a strided window gather
    XLA lowers to efficient copies) followed by one batched rfft — no Python
    loops, fully fusable.
  * The mel projection is a dense [n_mels, n_bins] matmul (MXU).

Behavioral contract mirrors the reference's use of
torchaudio.transforms.Spectrogram (rave/core.py:269-319, discriminator.py:12-20)
and librosa.filters.mel (rave/core.py:255-266).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """[B, T] -> [B, F, frame_length] overlapping frames (no padding).

    When frame_length is a multiple of hop (all stock configs: hop = n/4),
    frames are assembled from `frame_length // hop` strided reshapes —
    pure data movement XLA compiles to cheap copies. (The obvious
    `conv_general_dilated_patches` lowering builds a frame_length-wide
    identity-kernel convolution whose compile time is pathological at
    n_fft = 2048.)
    """
    B, T = x.shape
    if frame_length % hop == 0:
        n_frames = (T - frame_length) // hop + 1
        nb = frame_length // hop
        parts = [
            jax.lax.dynamic_slice_in_dim(x, j * hop, n_frames * hop, axis=1)
            .reshape(B, n_frames, hop)
            for j in range(nb)
        ]
        return jnp.concatenate(parts, axis=-1)
    patches = jax.lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return patches


import os
from functools import lru_cache

# 'fft' uses jnp.fft.rfft; 'matmul' evaluates the DFT as two real matmuls —
# more FLOPs but they run on the MXU, which on TPU often beats the FFT
# lowering for the loss-sized transforms (n_fft <= 4096).
STFT_METHOD = os.environ.get("RAVE_TPU_STFT", "fft")


@lru_cache(maxsize=32)
def _dft_basis(n_fft: int) -> np.ndarray:
    """[n_fft, 2*(n_fft//2+1)] real basis: cos ++ -sin columns."""
    k = np.arange(n_fft // 2 + 1)
    t = np.arange(n_fft)
    ang = 2 * np.pi * np.outer(t, k) / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def _rfft_frames(frames: jax.Array, n_fft: int) -> jax.Array:
    if STFT_METHOD == "matmul":
        basis = jnp.asarray(_dft_basis(n_fft), frames.dtype)
        out = frames @ basis  # [B, F, 2*bins] on the MXU
        bins = n_fft // 2 + 1
        return jax.lax.complex(out[..., :bins], out[..., bins:])
    return jnp.fft.rfft(frames, axis=-1)


def stft(
    x: jax.Array,
    n_fft: int,
    hop: int,
    *,
    center: bool = True,
    normalized: bool = False,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT of [B, T] -> [B, F, n_fft//2+1], Hann window.

    Matches torchaudio.transforms.Spectrogram(power=None) semantics:
    center=True reflect-pads n_fft//2 on both sides; normalized divides by
    the window's L2 norm.
    """
    if x.dtype not in (jnp.float32, jnp.float64):
        # XLA RFFT requires fp32/fp64 — upcast (e.g. bf16 discriminator
        # inputs under train.bf16_dis); callers may cast outputs back down
        x = x.astype(jnp.float32)
    if center:
        x = jnp.pad(x, [(0, 0), (n_fft // 2, n_fft // 2)], mode=pad_mode)
    frames = frame_signal(x, n_fft, hop)
    win = jnp.asarray(hann_window(n_fft), dtype=x.dtype)
    spec = _rfft_frames(frames * win, n_fft)
    if normalized:
        spec = spec / jnp.sqrt(jnp.sum(win**2))
    return spec


def spectrogram(
    x: jax.Array,
    n_fft: int,
    hop: int,
    *,
    power: float | None = 1.0,
    center: bool = True,
    normalized: bool = False,
) -> jax.Array:
    """Magnitude (power=1), power (power=2) or complex (power=None) spectrogram."""
    s = stft(x, n_fft, hop, center=center, normalized=normalized)
    if power is None:
        return s
    mag = jnp.abs(s)
    if power == 1.0:
        return mag
    return mag**power


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = m >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]
    (librosa.filters.mel parity; reference: rave/core.py:255-266)."""
    fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, fmax, n_bins)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


@dataclass(frozen=True)
class MultiScaleSTFT:
    """Bank of magnitude spectrograms at several resolutions.

    Reference: rave/core.py:269-319 (scales, hop = n//4, optional mel).
    Input [B, C, T] is flattened to [(B*C), T] like the reference.
    """

    scales: tuple[int, ...]
    sample_rate: int
    magnitude: bool = True
    normalized: bool = False
    num_mels: int | None = None

    def __call__(self, x: jax.Array) -> list[jax.Array]:
        if x.ndim == 3:  # [B, T, C] channels-last -> [(B*C), T]
            x = x.swapaxes(1, 2).reshape(-1, x.shape[1])
        outs = []
        for scale in self.scales:
            s = stft(x, scale, scale // 4, center=True, normalized=self.normalized)
            s = s.swapaxes(-1, -2)  # [B, bins, frames]
            if self.num_mels is not None:
                # Project the *complex* spectrum (reference order:
                # rave/core.py:309-315 applies MelScale before abs()).
                mel = jnp.asarray(
                    mel_filterbank(self.sample_rate, scale, self.num_mels)
                )
                s = jnp.einsum("bft,mf->bmt", s, mel.astype(s.dtype))
            if self.magnitude:
                outs.append(jnp.abs(s))
            else:
                outs.append(jnp.stack([s.real, s.imag], -1))
        return outs
