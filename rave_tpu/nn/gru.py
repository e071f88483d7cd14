"""Recurrent layer (GRU) with offline scan and O(1) streaming step.

Reference: rave/blocks.py:295-319 (optional recurrent layer in encoder /
generator, causal in both modes => zero delay contribution).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRU(nn.Module):
    """Multi-layer GRU over [B, T, C]; hidden size == input size.

    Offline: `lax.scan` over time (causal, delay 0). Streaming: hidden
    state carried in the 'cache' collection.
    """

    latent_size: int
    num_layers: int = 1
    stream_batch: int = 1

    @property
    def delay(self) -> int:
        return 0

    def setup(self):
        self.rnns = tuple(
            nn.RNN(nn.GRUCell(features=self.latent_size), name=f"rnn_{i}")
            for i in range(self.num_layers)
        )
        from rave_tpu.nn.conv import stream_variable

        self.h = stream_variable(
            self, "h", (self.num_layers, self.stream_batch, self.latent_size)
        )

    def _run(self, x: jax.Array, h0: jax.Array):
        """x [B, T, C], h0 [L, B, C] -> (y [B, T, C], hT [L, B, C])."""
        hs = []
        for i, rnn in enumerate(self.rnns):
            hT, x = rnn(x, initial_carry=h0[i], return_carry=True)
            hs.append(hT)
        return x, jnp.stack(hs, 0)

    def __call__(self, x: jax.Array) -> jax.Array:
        h0 = jnp.zeros(
            (self.num_layers, x.shape[0], self.latent_size), dtype=x.dtype
        )
        y, _ = self._run(x, h0)
        return y

    def step(self, x: jax.Array) -> jax.Array:
        h0 = self.h.value.astype(x.dtype)
        y, hT = self._run(x, h0)
        self.h.value = hT.astype(self.h.value.dtype)
        return y
