"""Latent prior primitives: erf-CDF quantization and diagonal time shift.

Reference: rave/prior/core.py (QuantizedNormal 6-41, DiagonalShift 44-75),
channels-last [B, T, D].
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


class QuantizedNormal:
    """Quantize N(0,1) latents into `resolution` equal-probability bins via
    the Gaussian CDF; decode with optional dither."""

    def __init__(self, resolution: int, dither: bool = True):
        self.resolution = resolution
        self.dither = dither
        self.clamp = 4.0

    def from_normal(self, x):
        return 0.5 * (1 + jax.scipy.special.erf(x / math.sqrt(2)))

    def to_normal(self, x):
        x = jax.scipy.special.erfinv(2 * x - 1) * math.sqrt(2)
        return jnp.clip(x, -self.clamp, self.clamp)

    def encode_classes(self, x):
        """[B, T, D] floats -> [B, T, D] int bins."""
        q = jnp.floor(self.from_normal(x) * self.resolution)
        return jnp.clip(q, 0, self.resolution - 1).astype(jnp.int32)

    def to_stack_one_hot(self, classes):
        """[B, T, D] ints -> [B, T, D*R] one-hot (D major, R minor)."""
        oh = jax.nn.one_hot(classes, self.resolution, dtype=jnp.float32)
        B, T, D, R = oh.shape
        return oh.reshape(B, T, D * R)

    def encode(self, x):
        return self.to_stack_one_hot(self.encode_classes(x))

    def decode(self, x, rng=None):
        """[B, T, D*R] stacked one-hot/logits -> [B, T, D] floats."""
        B, T, _ = x.shape
        x = x.reshape(B, T, -1, self.resolution)
        q = jnp.argmax(x, -1).astype(jnp.float32) / self.resolution
        if self.dither and rng is not None:
            q = q + jax.random.uniform(rng, q.shape) / self.resolution
        return self.to_normal(q)


class DiagonalShift:
    """Shift dimension d by (D-1-d) steps so that, after the shift, dim d at
    time t only conditions on dims < d at the same step during
    autoregression. Output is D-1 steps shorter. Reference:
    rave/prior/core.py:44-75, channels-last."""

    def shift(self, x):
        """[B, T, D] -> [B, T-D+1, D]."""
        B, T, D = x.shape
        cols = [
            jax.lax.dynamic_slice_in_dim(x[..., d], D - 1 - d, T - D + 1, axis=1)
            for d in range(D)
        ]
        return jnp.stack(cols, axis=-1)

    def __call__(self, x):
        return self.shift(x)

    def inverse(self, x):
        return self.shift(x[..., ::-1])[..., ::-1]
