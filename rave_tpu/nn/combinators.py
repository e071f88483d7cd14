"""Delay-aware combinators: Sequential, Residual, AlignBranches, StreamDelay.

TPU-native equivalents of cc.CachedSequential / cc.AlignBranches
(SURVEY.md §2.9; reference call sites rave/blocks.py:31-45, 74, 136, 158).
The builder (rave_tpu/models/blocks.py) threads `in_delay` through child
constructors; these combinators only *apply* children and, in streaming mode,
insert the compensating ring-buffer delays so parallel branches stay aligned.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def module_delay(m: Any, default: int = 0) -> int:
    """Cumulative output delay of a module, passthrough for stateless ones."""
    return getattr(m, "delay", default)


def seq_delay(layers: Sequence[Any], in_delay: int = 0) -> int:
    """Delay after applying `layers` in order (builder-side helper)."""
    d = in_delay
    for l in layers:
        d = module_delay(l, d)
    return d


class Lambda(nn.Module):
    """Stateless pointwise op usable in both modes (delay-transparent)."""

    fn: Callable

    def __call__(self, x):
        return self.fn(x)

    def step(self, x):
        return self.fn(x)


class StreamDelay(nn.Module):
    """Pure delay line of `d` samples, active only on the streaming path."""

    d: int
    features: int
    stream_batch: int = 1

    @property
    def delay(self) -> int:  # own contribution; in_delay handled by parents
        return self.d

    def setup(self):
        if self.d > 0:
            from rave_tpu.nn.conv import stream_variable

            self.buf = stream_variable(
                self, "delay", (self.stream_batch, self.d, self.features)
            )

    def __call__(self, x):
        return x

    def step(self, x):
        if self.d == 0:
            return x
        buf = self.buf.value
        ext = jnp.concatenate([buf.astype(x.dtype), x], axis=1)
        self.buf.value = ext[:, ext.shape[1] - self.d :, :].astype(buf.dtype)
        return ext[:, : x.shape[1], :]


class Sequential(nn.Module):
    """Applies children in order in both modes; mirrors cc.CachedSequential."""

    layers: Tuple[Any, ...]

    @property
    def delay(self) -> int:
        d = 0
        for l in self.layers:
            d = module_delay(l, d)
        return d

    def __call__(self, x):
        for l in self.layers:
            x = l(x)
        return x

    def step(self, x):
        for l in self.layers:
            x = l.step(x) if hasattr(l, "step") else l(x)
        return x


class Residual(nn.Module):
    """x + inner(x), with the identity branch delay-matched when streaming.

    `inner_delay` is inner's *own* delay (built with in_delay=0); the
    builder adds it to the surrounding cumulative delay
    (reference: rave/blocks.py:31-45).
    """

    inner: Any
    inner_delay: int
    features: int
    stream_batch: int = 1

    def setup(self):
        self.skip_delay = StreamDelay(
            d=self.inner_delay,
            features=self.features,
            stream_batch=self.stream_batch,
        )

    def __call__(self, x):
        return x + self.inner(x)

    def step(self, x):
        return self.skip_delay.step(x) + self.inner.step(x)


class AlignBranches(nn.Module):
    """Runs branches in parallel; when streaming, delays each branch output
    by (max_delay - branch_delay) so all outputs are time-aligned at
    max(delays). Mirrors cc.AlignBranches (SURVEY.md §2.9).
    """

    branches: Tuple[Any, ...]
    delays: Tuple[int, ...]
    features: Tuple[int, ...]
    stream_batch: int = 1

    @property
    def delay(self) -> int:
        return max(self.delays)

    def setup(self):
        m = max(self.delays)
        self.compensation = tuple(
            StreamDelay(d=m - d, features=f, stream_batch=self.stream_batch)
            for d, f in zip(self.delays, self.features)
        )

    def __call__(self, x):
        return tuple(b(x) for b in self.branches)

    def step(self, x):
        outs = []
        for b, c in zip(self.branches, self.compensation):
            y = b.step(x) if hasattr(b, "step") else b(x)
            outs.append(c.step(y))
        return tuple(outs)
