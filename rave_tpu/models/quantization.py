"""Residual vector quantization with EMA codebooks, jit-native.

Re-design of the reference's RVQ (rave/quantization.py, itself adapted from
lucidrains/vector-quantize-pytorch) for SPMD execution:

  * Codebook state (embed / embed_avg / cluster_size / inited) lives in the
    'codebook' flax collection and is REPLICATED across the data-parallel
    mesh. All statistics that drive updates (one-hot counts, embed sums)
    are computed from the *global* batch — under pjit the batch axis is
    sharded, XLA inserts the cross-chip reductions, and every chip applies
    the identical update. This preserves the reference's "all workers take
    the same decision" invariant (rave/quantization.py:169-179) without any
    explicit collectives.
  * k-means init on the first training batch runs inside jit via
    `lax.cond` + fixed-iteration `fori_loop` (rave/quantization.py:102-109).
  * Dead-code expiry is branch-free: expired codes are masked and replaced
    by random batch samples every step (rave/quantization.py:111-126).
  * The nearest-code search is one [P, D] x [D, N] matmul (MXU) instead of
    a pairwise-difference tensor.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _sample_vectors(rng, samples: jax.Array, num: int) -> jax.Array:
    """`num` rows sampled (with replacement) from samples [P, D]."""
    idx = jax.random.randint(rng, (num,), 0, samples.shape[0])
    return samples[idx]


def _kmeans(rng, samples: jax.Array, num_clusters: int, iters: int):
    """Fixed-iteration k-means (reference rave/quantization.py:36-56)."""
    means = _sample_vectors(rng, samples, num_clusters)

    def body(_, means):
        dists = (
            2 * samples @ means.T
            - jnp.sum(samples**2, -1, keepdims=True)
            - jnp.sum(means**2, -1)[None, :]
        )
        buckets = jnp.argmax(dists, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(onehot, axis=0)
        new_means = onehot.T @ samples / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where(bins[:, None] == 0, means, new_means)

    means = jax.lax.fori_loop(0, iters, body, means)
    dists = (
        2 * samples @ means.T
        - jnp.sum(samples**2, -1, keepdims=True)
        - jnp.sum(means**2, -1)[None, :]
    )
    buckets = jnp.argmax(dists, axis=-1)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype), 0)
    return means, bins


class EuclideanCodebook(nn.Module):
    """EMA-updated codebook with k-means init and dead-code expiry.

    Reference: rave/quantization.py:59-181.
    """

    dim: int
    codebook_size: int
    kmeans_init: bool = True
    kmeans_iters: int = 50
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_ema_dead_code: int = 2

    def setup(self):
        self.embed = self.variable(
            "codebook",
            "embed",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            self.make_rng("params") if self.is_initializing() else None,
            (self.codebook_size, self.dim),
        )
        self.embed_avg = self.variable(
            "codebook", "embed_avg", lambda: self.embed.value.copy()
        )
        self.cluster_size = self.variable(
            "codebook", "cluster_size", jnp.zeros, (self.codebook_size,)
        )
        self.inited = self.variable(
            "codebook",
            "inited",
            lambda: jnp.asarray(0.0 if self.kmeans_init else 1.0),
        )

    def _quantize(self, flat: jax.Array) -> jax.Array:
        e = self.embed.value.astype(flat.dtype)
        dist = (
            2 * flat @ e.T
            - jnp.sum(flat**2, -1, keepdims=True)
            - jnp.sum(e**2, -1)[None, :]
        )
        return jnp.argmax(dist, axis=-1)

    def encode(self, x: jax.Array) -> jax.Array:
        shape = x.shape
        idx = self._quantize(x.reshape(-1, shape[-1]))
        return idx.reshape(shape[:-1])

    def decode(self, idx: jax.Array) -> jax.Array:
        return self.embed.value[idx]

    def __call__(self, x: jax.Array, train: bool = False, rng=None):
        """x [..., D] -> (quantized [..., D], indices [...])."""
        shape = x.shape
        flat = x.reshape(-1, shape[-1]).astype(jnp.float32)

        if train and self.is_mutable_collection("codebook"):
            # k-means init on first batch (lax.cond keeps it one program).
            def do_init(_):
                return _kmeans(rng, flat, self.codebook_size, self.kmeans_iters)

            def no_init(_):
                return self.embed.value, self.cluster_size.value

            embed, csize = jax.lax.cond(
                self.inited.value == 0.0, do_init, no_init, None
            )
            embed_avg = jnp.where(
                self.inited.value == 0.0, embed, self.embed_avg.value
            )
            self.embed.value = embed
            self.embed_avg.value = embed_avg
            self.cluster_size.value = jnp.where(
                self.inited.value == 0.0, csize, self.cluster_size.value
            )
            self.inited.value = jnp.ones_like(self.inited.value)

        idx_flat = self._quantize(flat)
        quantized = self.embed.value[idx_flat].reshape(shape).astype(x.dtype)

        if train and self.is_mutable_collection("codebook"):
            onehot = jax.nn.one_hot(idx_flat, self.codebook_size, dtype=jnp.float32)
            counts = jnp.sum(onehot, axis=0)
            embed_sum = onehot.T @ flat
            d = self.decay
            csize = self.cluster_size.value * d + counts * (1 - d)
            eavg = self.embed_avg.value * d + embed_sum * (1 - d)
            n = jnp.sum(csize)
            smoothed = (
                (csize + self.epsilon)
                / (n + self.codebook_size * self.epsilon)
                * n
            )
            embed_norm = eavg / smoothed[:, None]
            # dead-code expiry: replace rarely-used codes with batch samples
            if self.threshold_ema_dead_code > 0:
                expired = csize < self.threshold_ema_dead_code
                rng_exp = jax.random.fold_in(rng, 1)
                repl = _sample_vectors(rng_exp, flat, self.codebook_size)
                embed_norm = jnp.where(expired[:, None], repl, embed_norm)
            self.cluster_size.value = csize
            self.embed_avg.value = eavg
            self.embed.value = embed_norm

        idx = idx_flat.reshape(shape[:-1])
        return quantized, idx


class VectorQuantization(nn.Module):
    """One VQ stage: optional projections, STE, commitment loss.

    Reference: rave/quantization.py:184-270.
    """

    dim: int
    codebook_size: int
    codebook_dim: int = 0  # 0 -> dim
    decay: float = 0.99
    epsilon: float = 1e-5
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: int = 2
    commitment_weight: float = 1.0

    def setup(self):
        cdim = self.codebook_dim or self.dim
        self.needs_proj = cdim != self.dim
        if self.needs_proj:
            self.project_in = nn.Dense(cdim)
            self.project_out = nn.Dense(self.dim)
        self.codebook = EuclideanCodebook(
            dim=cdim,
            codebook_size=self.codebook_size,
            kmeans_init=self.kmeans_init,
            kmeans_iters=self.kmeans_iters,
            decay=self.decay,
            epsilon=self.epsilon,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
        )

    def encode(self, x: jax.Array) -> jax.Array:
        if self.needs_proj:
            x = self.project_in(x)
        return self.codebook.encode(x)

    def decode(self, idx: jax.Array) -> jax.Array:
        q = self.codebook.decode(idx)
        if self.needs_proj:
            q = self.project_out(q)
        return q

    def __call__(self, x: jax.Array, train: bool = False, rng=None):
        """x [B, T, D] -> (quantized, indices, commit_loss)."""
        h = self.project_in(x) if self.needs_proj else x
        q, idx = self.codebook(h, train=train, rng=rng)
        loss = jnp.asarray(0.0, jnp.float32)
        if train:
            q = h + jax.lax.stop_gradient(q - h)  # straight-through
            if self.commitment_weight > 0:
                loss = (
                    jnp.mean((jax.lax.stop_gradient(q) - h) ** 2)
                    * self.commitment_weight
                )
        if self.needs_proj:
            q = self.project_out(q)
        return q, idx, loss


class ResidualVectorQuantization(nn.Module):
    """Stack of VQ layers over successive residuals (SoundStream Alg. 1).

    Reference: rave/quantization.py:273-318. encode -> [B, Q, T] indices.
    """

    num_quantizers: int
    dim: int
    codebook_size: int
    decay: float = 0.99
    threshold_ema_dead_code: int = 2
    commitment_weight: float = 1.0
    kmeans_init: bool = True
    kmeans_iters: int = 50

    def setup(self):
        self.layers = tuple(
            VectorQuantization(
                dim=self.dim,
                codebook_size=self.codebook_size,
                decay=self.decay,
                threshold_ema_dead_code=self.threshold_ema_dead_code,
                commitment_weight=self.commitment_weight,
                kmeans_init=self.kmeans_init,
                kmeans_iters=self.kmeans_iters,
                name=f"vq_{i}",
            )
            for i in range(self.num_quantizers)
        )

    def __call__(self, x: jax.Array, train: bool = False, rng=None):
        quantized_out = jnp.zeros_like(x)
        residual = x
        losses, indices = [], []
        for i, layer in enumerate(self.layers):
            r = None if rng is None else jax.random.fold_in(rng, i)
            q, idx, loss = layer(residual, train=train, rng=r)
            residual = residual - q
            quantized_out = quantized_out + q
            losses.append(loss)
            indices.append(idx)
        return (
            quantized_out,
            jnp.sum(jnp.stack(losses)),
            jnp.stack(indices, axis=1),  # [B, Q, T]
        )

    def encode(self, x: jax.Array) -> jax.Array:
        residual = x
        out = []
        for layer in self.layers:
            idx = layer.encode(residual)
            q = layer.decode(idx)
            residual = residual - q
            out.append(idx)
        return jnp.stack(out, axis=1)

    def decode(self, indices: jax.Array) -> jax.Array:
        out = 0.0
        for i, layer in enumerate(self.layers):
            out = out + layer.decode(indices[:, i])
        return out
