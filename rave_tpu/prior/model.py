"""Autoregressive WaveNet-style prior over RAVE latents.

Reference: rave/prior/model.py (Prior 17-165, VariationalPrior 209-227) and
rave/prior/residual_block.py. All convolutions are causal, so the same
module serves offline training (teacher-forced) and O(1)-per-step streaming
generation through the 'cache' collection.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.nn.combinators import Lambda, Sequential
from rave_tpu.nn.conv import Conv1d
from rave_tpu.prior.core import DiagonalShift, QuantizedNormal


class GatedResidualBlock(nn.Module):
    """sigma(xa) * tanh(xb) gated causal conv with 1x1 residual/skip
    projections (reference rave/prior/residual_block.py:6-31)."""

    res_size: int
    skp_size: int
    kernel_size: int
    dilation: int
    stream_batch: int = 1

    def setup(self):
        self.dconv = Conv1d(
            in_features=self.res_size,
            features=2 * self.res_size,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            mode="causal",
            stream_batch=self.stream_batch,
        )
        self.rconv = Conv1d(
            in_features=self.res_size, features=self.res_size, kernel_size=1
        )
        self.sconv = Conv1d(
            in_features=self.res_size, features=self.skp_size, kernel_size=1
        )

    def _gate(self, x, res, skp):
        xa, xb = jnp.split(x, 2, axis=-1)
        g = jax.nn.sigmoid(xa) * jnp.tanh(xb)
        return res + self.rconv(g), skp + self.sconv(g)

    def __call__(self, x, skp):
        return self._gate(self.dconv(x), x, skp)

    def step(self, x, skp):
        return self._gate(self.dconv.step(x), x, skp)


class Prior(nn.Module):
    """Grouped causal pre-net -> gated residual stack -> grouped post-net
    over stacked one-hot quantized latents (reference rave/prior/model.py:
    38-67, 103-109)."""

    latent_size: int
    resolution: int = 32
    res_size: int = 512
    skp_size: int = 256
    kernel_size: int = 3
    cycle_size: int = 4
    n_layers: int = 10
    stream_batch: int = 1

    @property
    def receptive_field(self) -> int:
        return (self.kernel_size - 1) * int(
            np.sum(2 ** (np.arange(self.n_layers) % self.cycle_size))
        ) + 1

    def setup(self):
        self.pre_net = Sequential(
            layers=(
                Conv1d(
                    in_features=self.resolution * self.latent_size,
                    features=self.res_size,
                    kernel_size=self.kernel_size,
                    mode="causal",
                    groups=self.latent_size,
                    stream_batch=self.stream_batch,
                ),
                Lambda(lambda x: jax.nn.leaky_relu(x, 0.2)),
            )
        )
        self.residuals = tuple(
            GatedResidualBlock(
                res_size=self.res_size,
                skp_size=self.skp_size,
                kernel_size=self.kernel_size,
                dilation=2 ** (i % self.cycle_size),
                stream_batch=self.stream_batch,
                name=f"res_{i}",
            )
            for i in range(self.n_layers)
        )
        self.post_net = Sequential(
            layers=(
                Conv1d(
                    in_features=self.skp_size,
                    features=self.skp_size,
                    kernel_size=1,
                ),
                Lambda(lambda x: jax.nn.leaky_relu(x, 0.2)),
                Conv1d(
                    in_features=self.skp_size,
                    features=self.resolution * self.latent_size,
                    kernel_size=1,
                    groups=self.latent_size,
                ),
            )
        )

    def __call__(self, x):
        """[B, T, D*R] -> logits [B, T, D*R]."""
        res = self.pre_net(x)
        skp = jnp.zeros(res.shape[:-1] + (self.skp_size,), res.dtype)
        for layer in self.residuals:
            res, skp = layer(res, skp)
        return self.post_net(skp)

    def step(self, x):
        res = self.pre_net.step(x)
        skp = jnp.zeros(res.shape[:-1] + (self.skp_size,), res.dtype)
        for layer in self.residuals:
            res, skp = layer.step(res, skp)
        return self.post_net.step(skp)


def split_classes(x: jax.Array, latent_size: int) -> jax.Array:
    """[B, T, D*R] -> [B, T, D, R] (reference rave/prior/model.py:129-134)."""
    B, T, _ = x.shape
    return x.reshape(B, T, latent_size, -1)


def prior_loss(
    prior: Prior, params, x_onehot: jax.Array, latent_size: int,
    n_real: Optional[int] = None,
) -> jax.Array:
    """Teacher-forced next-step cross-entropy
    (reference rave/prior/model.py:151-165).

    `n_real`: when the batch carries padding rows (the small-batch
    space_to_batch_converter workaround in prior/train.py), average the
    loss over the first `n_real` examples only."""
    logits = prior.apply({"params": params}, x_onehot)
    target = jnp.argmax(split_classes(x_onehot[:, 1:], latent_size), -1)
    pred = split_classes(logits[:, :-1], latent_size)
    logp = jax.nn.log_softmax(pred, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)
    if n_real is not None:
        nll = nll[:n_real]
    return jnp.mean(nll)


def sample_prediction(
    logits: jax.Array, latent_size: int, resolution: int, rng,
    argmax: bool = False,
) -> jax.Array:
    """Logits [B, T, D*R] -> sampled stacked one-hot
    (reference rave/prior/model.py:136-149)."""
    cls = split_classes(logits, latent_size)
    if argmax:
        idx = jnp.argmax(cls, -1)
    else:
        idx = jax.random.categorical(rng, cls, axis=-1)
    oh = jax.nn.one_hot(idx, resolution, dtype=jnp.float32)
    B, T, D, R = oh.shape
    return oh.reshape(B, T, D * R)


def generate(
    prior: Prior,
    params,
    cache,
    x0: jax.Array,
    n_steps: int,
    rng,
    argmax: bool = False,
):
    """Autoregressive generation with O(1) streaming steps under lax.scan.

    `x0` [B, 1, D*R] seeds the chain; returns [B, n_steps, D*R] stacked
    one-hots (reference rave/prior/model.py:111-127, which replays the
    cached-conv buffers step by step).
    """

    def step_fn(carry, rng_i):
        cache, x = carry
        logits, updated = prior.apply(
            {"params": params, "cache": cache},
            x,
            method="step",
            mutable=["cache"],
        )
        nxt = sample_prediction(
            logits, prior.latent_size, prior.resolution, rng_i, argmax
        )
        return (updated["cache"], nxt), nxt

    rngs = jax.random.split(rng, n_steps)
    (_, _), ys = jax.lax.scan(step_fn, (cache, x0), rngs)
    # ys: [n_steps, B, 1, D*R] -> [B, n_steps, D*R]
    return jnp.swapaxes(ys[:, :, 0, :], 0, 1)
