"""PQMF as a dual-mode linen module (streaming analysis/synthesis).

The TPU-native equivalent of the reference's CachedPQMF
(rave/pqmf.py:245-294): both directions are stride-1 dense convs at the
decimated rate over constant (non-trainable) polyphase kernels, with the
same left-context caching as rave_tpu.nn.conv. The PQMFBank dataclass is
hashable on (attenuation, n_band) so it can be a module field.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from rave_tpu.nn.conv import stream_variable
from rave_tpu.ops.pqmf import PQMFBank, reverse_half


class PQMFAnalysis(nn.Module):
    """[B, T, C] waveform -> [B, T//M, C*M] band frames."""

    bank: PQMFBank
    n_channels: int = 1
    mode: str = "centered"
    stream_batch: int = 1

    @property
    def M(self) -> int:
        return self.bank.n_band

    @property
    def pad(self):
        Q = self.bank.taps
        if Q == 0:
            return (0, 0)
        return (Q // 2, (Q - 1) - Q // 2) if self.mode == "centered" else (Q - 1, 0)

    @property
    def delay(self) -> int:
        """Streaming delay in output frames."""
        return self.pad[1]

    def setup(self):
        if sum(self.pad) > 0:
            self.cache = stream_variable(
                self,
                "pad",
                (self.stream_batch * self.n_channels, sum(self.pad), self.M),
            )

    def _frames(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        # [B, T, C] -> [B*C, T//M, M]
        x = x.swapaxes(1, 2).reshape(B * C, T // self.M, self.M)
        return x

    def _conv(self, frames: jax.Array, padding, offset: int = 0) -> jax.Array:
        z = jax.lax.conv_general_dilated(
            frames,
            jnp.asarray(self.bank.analysis_kernel, dtype=frames.dtype),
            window_strides=(1,),
            padding=(padding,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        # streaming output lags the offline timeline by `delay` frames; the
        # alternating sign must track offline frame parity
        return reverse_half(z, offset)

    def _merge(self, z: jax.Array, B: int) -> jax.Array:
        # [B*C, F, M] -> [B, F, C*M]
        F = z.shape[1]
        z = z.reshape(B, self.n_channels, F, self.M)
        return z.swapaxes(1, 2).reshape(B, F, self.n_channels * self.M)

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.M == 1:
            return x
        B = x.shape[0]
        return self._merge(self._conv(self._frames(x), self.pad), B)

    def step(self, x: jax.Array) -> jax.Array:
        if self.M == 1:
            return x
        B = x.shape[0]
        frames = self._frames(x)
        if sum(self.pad) > 0:
            buf = self.cache.value
            ext = jnp.concatenate([buf.astype(frames.dtype), frames], axis=1)
            self.cache.value = ext[:, ext.shape[1] - sum(self.pad) :, :].astype(
                buf.dtype
            )
            z = self._conv(ext, (0, 0), offset=self.delay % 2)
        else:
            z = self._conv(frames, (0, 0), offset=self.delay % 2)
        return self._merge(z, B)


class PQMFSynthesis(nn.Module):
    """[B, T//M, C*M] band frames -> [B, T, C] waveform.

    `in_delay` is the band-frame stream's cumulative delay (frames).
    """

    bank: PQMFBank
    n_channels: int = 1
    mode: str = "centered"
    in_delay: int = 0
    stream_batch: int = 1

    @property
    def M(self) -> int:
        return self.bank.n_band

    @property
    def pad(self):
        Q = self.bank.taps
        if Q == 0:
            return (0, 0)
        return ((Q - 1) - Q // 2, Q // 2) if self.mode == "centered" else (Q - 1, 0)

    @property
    def delay(self) -> int:
        """Streaming delay in output *waveform* samples."""
        return (self.in_delay + self.pad[1]) * self.M

    def setup(self):
        if sum(self.pad) > 0:
            self.cache = stream_variable(
                self,
                "pad",
                (self.stream_batch * self.n_channels, sum(self.pad), self.M),
            )

    def _split(self, z: jax.Array):
        # [B, F, C*M] -> [B*C, F, M]
        B, F, _ = z.shape
        z = z.reshape(B, F, self.n_channels, self.M).swapaxes(1, 2)
        return z.reshape(B * self.n_channels, F, self.M)

    def _conv(self, z: jax.Array, padding) -> jax.Array:
        return jax.lax.conv_general_dilated(
            z,
            jnp.asarray(self.bank.synthesis_kernel, dtype=z.dtype),
            window_strides=(1,),
            padding=(padding,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def _merge(self, y: jax.Array, B: int) -> jax.Array:
        # [B*C, F, M] phases -> [B, F*M, C]
        F = y.shape[1]
        y = y.reshape(B, self.n_channels, F * self.M)
        return y.swapaxes(1, 2)

    def __call__(self, z: jax.Array) -> jax.Array:
        if self.M == 1:
            return z
        B = z.shape[0]
        return self._merge(self._conv(reverse_half(self._split(z)), self.pad), B)

    def step(self, z: jax.Array) -> jax.Array:
        # NOTE: reverse_half's sign pattern alternates with absolute frame
        # parity, so it is applied chunk-locally *before* caching (chunks
        # must hold an even number of frames — any block size divisible by
        # 2*M, always true for the stock configs), with the phase offset
        # tracking the incoming stream's lag vs. the offline timeline.
        if self.M == 1:
            return z
        B = z.shape[0]
        zz = reverse_half(self._split(z), self.in_delay % 2)
        if sum(self.pad) > 0:
            buf = self.cache.value
            ext = jnp.concatenate([buf.astype(zz.dtype), zz], axis=1)
            self.cache.value = ext[:, ext.shape[1] - sum(self.pad) :, :].astype(
                buf.dtype
            )
            y = self._conv(ext, (0, 0))
        else:
            y = self._conv(zz, (0, 0))
        return self._merge(y, B)
