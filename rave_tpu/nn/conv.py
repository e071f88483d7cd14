"""Dual-mode (offline / streaming) 1-D convolutions with static delay algebra.

This is the TPU-native equivalent of the reference's `cached_conv` dependency
(SURVEY.md §2.9; call sites rave/blocks.py, rave/pqmf.py:245-294,
scripts/export.py:493). Design:

  * Offline mode: one `lax.conv_general_dilated` (NWC) with 'centered' or
    'causal' padding — traced once, tiled onto the MXU by XLA.
  * Streaming mode: an explicit `(params, cache) -> (y, cache)` step; each
    layer carries its left context in a flax 'cache' collection. Chunked
    streaming is *exactly* (bit-identical) the causal offline computation.
  * Delay algebra: every layer knows statically how many output-rate samples
    its causal/streaming output lags the centered offline output
    (`layer.delay`). Parents thread `in_delay` through constructors the way
    the reference threads `cumulative_delay`. For strided convs, an `extra`
    left-shift rounds the delay up to a whole output frame:
        extra     = (-(in_delay + pad_right)) % stride
        out_delay = (in_delay + pad_right + extra) // stride
    so branch alignment (AlignBranches) always works in whole samples.

Data layout is channels-last [B, T, C] everywhere.
"""
from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_padding(
    kernel_size: int,
    stride: int = 1,
    dilation: int = 1,
    mode: str = "centered",
) -> Tuple[int, int]:
    """(left, right) padding for same-rate (T -> T/stride) output.

    Total padding is max(0, dilation*(kernel-1) + 1 - stride); 'centered'
    splits it with the larger half on the left, 'causal' puts all of it on
    the left (zero lookahead). Mirrors cc.get_padding (SURVEY.md §2.9).
    """
    total = max(0, dilation * (kernel_size - 1) + 1 - stride)
    if mode == "centered":
        right = total // 2
        return (total - right, right)
    elif mode == "causal":
        return (total, 0)
    raise ValueError(f"padding mode must be centered|causal, got {mode}")


def conv_delay(
    in_delay: int, kernel: int, stride: int = 1, dilation: int = 1,
    mode: str = "centered",
) -> int:
    """Pure delay algebra for Conv1d (no module construction — safe to call
    from any context, including flax-wrapped methods)."""
    r = get_padding(kernel, stride, dilation, mode)[1]
    e = (-(in_delay + r)) % stride
    return (in_delay + r + e) // stride


def tconv_delay(in_delay: int, ratio: int, mode: str = "centered") -> int:
    """Pure delay algebra for ConvTranspose1d."""
    return in_delay * ratio + (ratio // 2 if mode == "centered" else 0)


def _norm_weight(v: jax.Array, g: jax.Array) -> jax.Array:
    """weight_norm reparameterization: w = g * v / ||v|| (per out-channel)."""
    norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
    return v * (g / norm)


def guarded_variable(mod: nn.Module, col: str, name: str, init_fn, *args):
    """Declare a variable only when its collection is live (init, or apply
    with the collection provided/mutable); lets param-only applies skip
    auxiliary state entirely."""
    if mod.is_mutable_collection(col) or mod.has_variable(col, name):
        return mod.variable(col, name, init_fn, *args)
    return None


def stream_variable(mod: nn.Module, name: str, shape):
    """Streaming-state variable in the 'cache' collection. Offline training
    never materializes stream state, so checkpoints stay cache-free."""
    return guarded_variable(mod, "cache", name, jnp.zeros, shape)


class Conv1d(nn.Module):
    """Strided/dilated conv with centered|causal padding and streaming cache.

    Offline: `__call__(x)`, x [B, T, C] -> [B, T//stride, features].
    Streaming: `step(x)` with chunk length divisible by `stride`; carries
    `cache_len = pad_total + extra_delay` input samples of left context.
    """

    in_features: int
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    mode: str = "centered"
    use_bias: bool = True
    weight_norm: bool = False
    groups: int = 1
    in_delay: int = 0
    stream_batch: int = 1
    kernel_init: Callable = nn.initializers.lecun_normal()

    # ---- static delay algebra -------------------------------------------
    @property
    def pad(self) -> Tuple[int, int]:
        return get_padding(self.kernel_size, self.stride, self.dilation, self.mode)

    @property
    def extra_delay(self) -> int:
        return (-(self.in_delay + self.pad[1])) % self.stride

    @property
    def delay(self) -> int:
        """Cumulative streaming delay of the output, in output-rate samples."""
        return (self.in_delay + self.pad[1] + self.extra_delay) // self.stride

    @property
    def cache_len(self) -> int:
        return sum(self.pad) + self.extra_delay

    @property
    def full_kernel(self) -> int:
        return self.dilation * (self.kernel_size - 1) + 1

    def setup(self):
        assert self.in_features % self.groups == 0
        assert self.features % self.groups == 0
        kshape = (self.kernel_size, self.in_features // self.groups, self.features)
        if self.weight_norm:
            self.v = self.param("v", self.kernel_init, kshape)
            self.g = self.param(
                "g",
                lambda rng, shape: jnp.sqrt(
                    jnp.sum(self.v**2, axis=(0, 1), keepdims=True) + 1e-12
                ),
                (1, 1, self.features),
            )
        else:
            self.w = self.param("w", self.kernel_init, kshape)
        if self.use_bias:
            self.b = self.param("b", nn.initializers.zeros, (self.features,))
        if self.cache_len > 0:
            self.cache = stream_variable(
                self, "pad", (self.stream_batch, self.cache_len, self.in_features)
            )

    def _weight(self) -> jax.Array:
        return _norm_weight(self.v, self.g) if self.weight_norm else self.w

    def materialized_weight(self) -> jax.Array:
        """[K, I, O] kernel with weight_norm applied (for fused kernels)."""
        return self._weight()

    def _conv(self, x: jax.Array, padding) -> jax.Array:
        w = self._weight().astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride,),
            padding=(padding,),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + self.b.astype(y.dtype)
        return y

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._conv(x, self.pad)

    def step(self, x: jax.Array) -> jax.Array:
        if self.cache_len == 0:
            return self._conv(x, (0, 0))
        buf = self.cache.value
        ext = jnp.concatenate([buf.astype(x.dtype), x], axis=1)
        y = self._conv(ext, (0, 0))
        self.cache.value = ext[:, ext.shape[1] - self.cache_len :, :].astype(buf.dtype)
        # A pad-free fat-stride conv (kernel <= stride) whose extra shift
        # lets one more window fit emits a spurious trailing frame; it is
        # recomputed identically from the cache next chunk — drop it.
        return y[:, : x.shape[1] // self.stride, :]


class ConvTranspose1d(nn.Module):
    """Fractional-stride upsampling conv (kernel = 2*ratio, torch-compatible
    crop ratio//2), with causal streaming via overlap-add carry.

    Offline centered: y = full_transpose(x)[crop : crop + T*ratio]
    Streaming/causal: y = full_transpose(x)[0 : T*ratio] with the K-stride
    tail overlap-added into the next chunk. Causal output lags centered by
    `crop` samples (see SURVEY.md §2.9; reference rave/blocks.py:179-185).
    """

    in_features: int
    features: int
    ratio: int
    kernel_size: int = 0  # 0 -> 2 * ratio
    mode: str = "centered"
    use_bias: bool = True
    weight_norm: bool = False
    in_delay: int = 0
    stream_batch: int = 1
    kernel_init: Callable = nn.initializers.lecun_normal()

    @property
    def k(self) -> int:
        return self.kernel_size or 2 * self.ratio

    @property
    def crop(self) -> int:
        return self.ratio // 2 if self.mode == "centered" else 0

    @property
    def delay(self) -> int:
        return self.in_delay * self.ratio + self.crop

    @property
    def carry_len(self) -> int:
        return self.k - self.ratio

    def setup(self):
        kshape = (self.k, self.in_features, self.features)
        if self.weight_norm:
            self.v = self.param("v", self.kernel_init, kshape)
            self.g = self.param(
                "g",
                lambda rng, shape: jnp.sqrt(
                    jnp.sum(self.v**2, axis=(0, 1), keepdims=True) + 1e-12
                ),
                (1, 1, self.features),
            )
        else:
            self.w = self.param("w", self.kernel_init, kshape)
        if self.use_bias:
            self.b = self.param("b", nn.initializers.zeros, (self.features,))
        if self.carry_len > 0:
            self.carry = stream_variable(
                self, "carry", (self.stream_batch, self.carry_len, self.features)
            )

    def _weight(self) -> jax.Array:
        return _norm_weight(self.v, self.g) if self.weight_norm else self.w

    def _full(self, x: jax.Array) -> jax.Array:
        """Raw transposed conv: [B, T, C] -> [B, (T-1)*ratio + k, features]."""
        w = self._weight().astype(x.dtype)
        # y[j] = sum_i x[i] w[j - i*ratio]  ==  input-dilated correlation with
        # the flipped kernel, padded (k-1) on both sides.
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(w, 0),
            window_strides=(1,),
            padding=((self.k - 1, self.k - 1),),
            lhs_dilation=(self.ratio,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y

    def __call__(self, x: jax.Array) -> jax.Array:
        n = x.shape[1]
        y = self._full(x)[:, self.crop : self.crop + n * self.ratio, :]
        if self.use_bias:
            y = y + self.b.astype(y.dtype)
        return y

    def step(self, x: jax.Array) -> jax.Array:
        n = x.shape[1]
        y = self._full(x)
        out = y[:, : n * self.ratio, :]
        if self.carry_len > 0:
            carry = self.carry.value
            head = out[:, : self.carry_len, :] + carry.astype(out.dtype)
            out = jnp.concatenate([head, out[:, self.carry_len :, :]], axis=1)
            self.carry.value = y[:, n * self.ratio :, :].astype(carry.dtype)
        if self.use_bias:
            out = out + self.b.astype(out.dtype)
        return out
