"""Integer-ratio kaiser resampler as dual-mode convs.

Reference: rave/resampler.py — downsample = strided kaiser lowpass conv;
upsample = polyphase conv to `ratio` channels then sample interleave
(scale `ratio` to preserve amplitude). Streaming reuses the conv runtime's
caches; channels are folded into the batch like the reference's reshape.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.nn.conv import get_padding, stream_variable
from rave_tpu.ops.pqmf import kaiser_filter


def _design(ratio: int):
    filt = kaiser_filter(np.pi / ratio, 140)
    down = filt.astype(np.float32)  # [K]
    pad = len(filt) % ratio
    up = np.pad(filt, (pad, 0)).reshape(-1, ratio).T  # [ratio, K/ratio]
    pad2 = (up.shape[-1] + 1) % 2
    up = np.pad(up, ((0, 0), (pad2, 0))) * ratio  # amplitude-preserving
    return down, up.astype(np.float32)


class Resampler(nn.Module):
    """target_sr = ratio * model_sr; [B, T, C] <-> [B, T/ratio, C]."""

    target_sr: int
    model_sr: int
    mode: str = "centered"
    stream_batch: int = 1
    n_channels: int = 1

    @property
    def ratio(self) -> int:
        r = self.target_sr // self.model_sr
        assert r * self.model_sr == self.target_sr and r > 1, (
            f"target_sr must be an integer multiple of model_sr "
            f"({self.target_sr} vs {self.model_sr})"
        )
        return r

    def setup(self):
        down, up = _design(self.ratio)
        self._down = down
        self._up = up
        dp = get_padding(len(down), self.ratio, 1, self.mode)
        upk = up.shape[-1]
        upp = get_padding(upk, 1, 1, self.mode)
        self.down_pad, self.up_pad = dp, upp
        B = self.stream_batch * self.n_channels
        self.down_cache = stream_variable(self, "down", (B, sum(dp), 1))
        self.up_cache = stream_variable(self, "up", (B, sum(upp), 1))

    @property
    def down_delay(self) -> int:
        """model-rate samples of streaming lag for to_model_sampling_rate."""
        r = self.down_pad[1]
        return (r + ((-r) % self.ratio)) // self.ratio

    @property
    def up_delay(self) -> int:
        return self.up_pad[1] * self.ratio

    def _conv(self, x, w, pad, stride=1):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), (stride,), (pad,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def _flat(self, x):
        B, T, C = x.shape
        return x.swapaxes(1, 2).reshape(B * C, T, 1), (B, C)

    def _unflat(self, y, bc):
        B, C = bc
        return y.reshape(B, C, -1).swapaxes(1, 2)

    def to_model_sampling_rate(self, x, streaming: bool = False):
        """[B, T, C] @ target_sr -> [B, T/ratio, C] @ model_sr."""
        xf, bc = self._flat(x)
        w = self._down[:, None, None]
        if not streaming:
            y = self._conv(xf, w, self.down_pad, self.ratio)
        else:
            buf = self.down_cache.value
            ext = jnp.concatenate([buf.astype(xf.dtype), xf], axis=1)
            self.down_cache.value = ext[:, ext.shape[1] - buf.shape[1] :].astype(
                buf.dtype
            )
            y = self._conv(ext, w, (0, 0), self.ratio)
            y = y[:, : xf.shape[1] // self.ratio]
        return self._unflat(y, bc)

    def from_model_sampling_rate(self, x, streaming: bool = False):
        """[B, T, C] @ model_sr -> [B, T*ratio, C] @ target_sr."""
        xf, bc = self._flat(x)
        w = self._up.T[:, None, :]  # [K, 1, ratio]
        if not streaming:
            y = self._conv(xf, w, self.up_pad)
        else:
            buf = self.up_cache.value
            ext = jnp.concatenate([buf.astype(xf.dtype), xf], axis=1)
            self.up_cache.value = ext[:, ext.shape[1] - buf.shape[1] :].astype(
                buf.dtype
            )
            y = self._conv(ext, w, (0, 0))
        # [B*C, T, ratio] -> interleave phases -> [B*C, T*ratio, 1]
        y = y.reshape(y.shape[0], -1, 1)
        return self._unflat(y, bc)

    def step_to_model(self, x):
        return self.to_model_sampling_rate(x, streaming=True)

    def step_from_model(self, x):
        return self.from_model_sampling_rate(x, streaming=True)
