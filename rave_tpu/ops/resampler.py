"""Integer-ratio kaiser resampler as dual-mode convs.

Reference: rave/resampler.py — downsample = strided kaiser lowpass conv;
upsample = polyphase interpolation (amplitude-scaled by the ratio).
The polyphase kernels are derived so the offline path is zero-delay
(the filter's linear-phase group delay is absorbed by the padding), and
streaming uses the same left-context caching as rave_tpu.nn.conv.
"""
from __future__ import annotations

from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.nn.conv import stream_variable
from rave_tpu.ops.pqmf import kaiser_filter


@lru_cache(maxsize=8)
def _design(ratio: int):
    """(down_kernel [K,1,1], down_pads, up_kernel [Q,1,ratio], up_pads).

    Down: out[t] = sum_q g[q] x[t*r + q - c]           (zero delay)
    Up:   out[t*r + m] = r * sum_j x[t - j] g[j*r + m + c]
          == correlation kernel w[q, m] = r * g[(pl-q)*r + m + c].
    """
    g = kaiser_filter(np.pi / ratio, 140).astype(np.float64)
    K = len(g)
    c = K // 2
    down = g.astype(np.float32)[:, None, None]
    d_pads = (c, K - 1 - c)

    pl = -(-c // ratio)
    pr = (K - 1 - c) // ratio
    Q = pl + pr + 1
    up = np.zeros((Q, 1, ratio), np.float32)
    for q in range(Q):
        base = (pl - q) * ratio + c
        for m in range(ratio):
            idx = base + m
            if 0 <= idx < K:
                up[q, 0, m] = ratio * g[idx]
    return down, d_pads, up, (pl, pr)


class Resampler(nn.Module):
    """target_sr = ratio * model_sr; [B, T, C] <-> [B, T/ratio, C]."""

    target_sr: int
    model_sr: int
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

    @property
    def down_delay(self) -> int:
        """model-rate streaming lag of to_model_sampling_rate."""
        _, (pl, pr), _, _ = _design(self.ratio)
        extra = (-pr) % self.ratio
        return (pr + extra) // self.ratio

    @property
    def up_delay(self) -> int:
        """target-rate streaming lag of from_model_sampling_rate."""
        _, _, _, (pl, pr) = _design(self.ratio)
        return pr * self.ratio

    def setup(self):
        _, d_pads, _, u_pads = _design(self.ratio)
        B = self.stream_batch * self.n_channels
        extra = (-d_pads[1]) % self.ratio
        self._down_cache_len = sum(d_pads) + extra
        self._up_cache_len = sum(u_pads)
        self.down_cache = stream_variable(
            self, "down", (B, self._down_cache_len, 1)
        )
        self.up_cache = stream_variable(self, "up", (B, self._up_cache_len, 1))

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
        down, d_pads, _, _ = _design(self.ratio)
        xf, bc = self._flat(x)
        if not streaming:
            y = self._conv(xf, down, d_pads, self.ratio)
        else:
            buf = self.down_cache.value
            ext = jnp.concatenate([buf.astype(xf.dtype), xf], axis=1)
            self.down_cache.value = ext[
                :, ext.shape[1] - self._down_cache_len :
            ].astype(buf.dtype)
            y = self._conv(ext, down, (0, 0), self.ratio)
            y = y[:, : xf.shape[1] // self.ratio]
        return self._unflat(y, bc)

    def from_model_sampling_rate(self, x, streaming: bool = False):
        """[B, T, C] @ model_sr -> [B, T*ratio, C] @ target_sr."""
        _, _, up, u_pads = _design(self.ratio)
        xf, bc = self._flat(x)
        if not streaming:
            y = self._conv(xf, up, u_pads)
        else:
            buf = self.up_cache.value
            ext = jnp.concatenate([buf.astype(xf.dtype), xf], axis=1)
            self.up_cache.value = ext[
                :, ext.shape[1] - self._up_cache_len :
            ].astype(buf.dtype)
            y = self._conv(ext, up, (0, 0))
        # [B*C, T, ratio] phases -> [B*C, T*ratio, 1]
        y = y.reshape(y.shape[0], -1, 1)
        return self._unflat(y, bc)

    def step_to_model(self, x):
        return self.to_model_sampling_rate(x, streaming=True)

    def step_from_model(self, x):
        return self.from_model_sampling_rate(x, streaming=True)
