"""Adversarial critics: multi-scale, multi-period, spectral, and their
combination. Training-only (offline path), channels-last.

Reference: rave/discriminator.py (ConvNet 77-119, MultiScale 122-136,
MultiScaleSpectral(1d) 139-171, MultiPeriod 174-195, Combine 198-209,
EncodecConvNet 54-74). Each sub-network returns its per-layer feature maps;
the last feature is the score (rave/model.py:360-379).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.nn.conv import get_padding
from rave_tpu.ops.stft import stft


class WNConv(nn.Module):
    """Plain (non-streaming) nD conv with optional weight_norm, symmetric
    torch-style padding. kernel/stride/dilation/padding are tuples."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Tuple[int, ...]
    dilation: Tuple[int, ...] = ()
    weight_norm: bool = True
    groups: int = 1

    @nn.compact
    def weights(self, in_features: int):
        """Effective (post-weight-norm) kernel + bias; param layout is
        identical whether the conv is applied directly (__call__) or by a
        packed/fused caller (ops/packed_conv.py)."""
        nd = len(self.kernel_size)
        kshape = self.kernel_size + (in_features // self.groups, self.features)
        init = nn.initializers.lecun_normal()
        if self.weight_norm:
            v = self.param("v", init, kshape)
            g = self.param(
                "g",
                lambda rng, s: jnp.sqrt(
                    jnp.sum(v**2, axis=tuple(range(nd + 1)), keepdims=True) + 1e-12
                ),
                (1,) * (nd + 1) + (self.features,),
            )
            w = v * g / jnp.sqrt(
                jnp.sum(v**2, axis=tuple(range(nd + 1)), keepdims=True) + 1e-12
            )
        else:
            w = self.param("w", init, kshape)
        b = self.param("b", nn.initializers.zeros, (self.features,))
        return w, b

    def __call__(self, x):
        nd = len(self.kernel_size)
        dil = self.dilation or (1,) * nd
        w, b = self.weights(x.shape[-1])
        dn = ("NWC", "WIO", "NWC") if nd == 1 else ("NHWC", "HWIO", "NHWC")
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=self.strides,
            padding=tuple((p, p) for p in self.padding),
            rhs_dilation=dil,
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        return y + b.astype(y.dtype)


class ConvNet(nn.Module):
    """Feature-extracting conv stack; returns every conv's output.

    Reference: rave/discriminator.py:77-119. `kernel_size` int -> 1D over
    [B, T, C]; tuple -> 2D over [B, H, W, C].

    `fold_width=True` (period-folded callers, see MultiPeriodDiscriminator)
    takes an already width-folded [B*W, H, C] input and runs the stack as
    plain 1D convs. Valid exactly when kernel_size[1] == 1: a (k, 1) 2D
    conv never mixes the width axis, so the folded 1D conv computes the
    SAME values with the same per-tap reduction order — the feature maps
    are a pure batch-major permutation of the unfolded [B, H', W, C] ones.
    Parameter layout stays the 2D one (checkpoint compatible)."""

    out_size: int
    capacity: int
    n_layers: int
    kernel_size: Any
    stride: int
    fold_width: bool = False

    def _apply(self, conv: WNConv, x):
        """Apply `conv` (2D param layout) to a width-folded [B*W, H, C]
        input as the equivalent 1D conv."""
        w, b = conv.weights(x.shape[-1])
        y = jax.lax.conv_general_dilated(
            x,
            w[:, 0].astype(x.dtype),
            window_strides=conv.strides[:1],
            padding=((conv.padding[0], conv.padding[0]),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b.astype(y.dtype)

    @nn.compact
    def __call__(self, x):
        feats = []
        is_1d = isinstance(self.kernel_size, int)
        channels = [self.capacity * 2**i for i in range(self.n_layers)]
        for i in range(self.n_layers):
            if is_1d:
                pad = (get_padding(self.kernel_size, self.stride, mode="centered")[0],)
                conv = WNConv(
                    features=channels[i],
                    kernel_size=(self.kernel_size,),
                    strides=(self.stride,),
                    padding=pad,
                )
            else:
                pad = (
                    get_padding(self.kernel_size[0], self.stride, mode="centered")[0],
                    0,
                )
                conv = WNConv(
                    features=channels[i],
                    kernel_size=tuple(self.kernel_size),
                    strides=(self.stride, 1),
                    padding=pad,
                )
            if self.fold_width:
                assert not is_1d and self.kernel_size[1] == 1
                y = self._apply(conv, x)
            else:
                y = conv(x)
            feats.append(y)
            x = jax.nn.leaky_relu(y, 0.2)
        nd = 1 if is_1d else 2
        conv = WNConv(
            features=self.out_size,
            kernel_size=(1,) * nd,
            strides=(1,) * nd,
            padding=(0,) * nd,
            weight_norm=False,
        )
        y = self._apply(conv, x) if self.fold_width else conv(x)
        feats.append(y)
        return feats


class MultiScaleDiscriminator(nn.Module):
    """Average-pooled pyramid of 1D ConvNets (reference 122-136)."""

    n_discriminators: int
    capacity: int = 64
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        feats = []
        for i in range(self.n_discriminators):
            feats.append(
                ConvNet(
                    out_size=1,
                    capacity=self.capacity,
                    n_layers=self.n_layers,
                    kernel_size=self.kernel_size,
                    stride=self.stride,
                    name=f"scale_{i}",
                )(x)
            )
            x = nn.avg_pool(x, (2,), strides=(2,), padding="VALID")
        return feats


class MultiPeriodDiscriminator(nn.Module):
    """Fold-by-period 2D critics (reference 174-195).

    `packed=True` (default) moves the period axis into the BATCH and runs
    each stack as 1D convs on [B*p, T/p, C]. A (k, 1) kernel never mixes
    the period axis, so the folded stack computes exactly the same values;
    feature maps come back batch-major-permuted, which every consumer in
    train/steps.py (elementwise-mean feature matching + GAN losses over a
    real/fake batch split that the fold preserves) is invariant to. On TPU
    the tiny width axis (p = 2..11) otherwise sits in a tiled layout
    dimension and the memory-bound stack pays the padding: folding is a
    pure byte-traffic win with bit-identical parameters
    (tests/test_discriminator_packed.py)."""

    periods: Tuple[int, ...]
    capacity: int = 64
    n_layers: int = 4
    kernel_size: Tuple[int, int] = (5, 1)
    stride: int = 4
    packed: bool = True

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, p in enumerate(self.periods):
            pad = (p - x.shape[1] % p) % p
            xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            xp = xp.reshape(x.shape[0], -1, p, x.shape[-1])  # [B, T/p, p, C]
            if self.packed:
                # [B, T/p, p, C] -> [B*p, T/p, C] (period-major per sample)
                xp = xp.transpose(0, 2, 1, 3).reshape(
                    x.shape[0] * p, -1, x.shape[-1]
                )
            feats.append(
                ConvNet(
                    out_size=1,
                    capacity=self.capacity,
                    n_layers=self.n_layers,
                    kernel_size=self.kernel_size,
                    stride=self.stride,
                    fold_width=self.packed,
                    name=f"period_{p}_{i}",
                )(xp)
            )
        return feats


class MultiScaleSpectralDiscriminator1d(nn.Module):
    """Complex-STFT 1D critics: real/imag stacked on channel axis
    (reference 156-171)."""

    scales: Tuple[int, ...]
    capacity: int = 64
    n_layers: int = 4
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        feats = []
        flat = x.reshape(-1, x.shape[1])  # [B*C, T]
        for i, scale in enumerate(self.scales):
            s = stft(flat, scale, scale // 4, center=False, normalized=True)
            # [B*C, F, bins] -> [B, F, 2*bins] channels-last (real ++ imag)
            spec = jnp.concatenate([s.real, s.imag], axis=-1)
            spec = spec.reshape(x.shape[0], -1, spec.shape[-1]).astype(x.dtype)
            feats.append(
                ConvNet(
                    out_size=1,
                    capacity=self.capacity,
                    n_layers=self.n_layers,
                    kernel_size=self.kernel_size,
                    stride=self.stride,
                    name=f"spec_{scale}_{i}",
                )(spec)
            )
        return feats


class EncodecConvNet(nn.Module):
    """2D spectral critic over [B, F, T, 2*C] (reference 54-74)."""

    capacity: int

    @nn.compact
    def __call__(self, x):
        feats = []
        specs = [
            # (kernel, stride, dilation)
            ((9, 3), (1, 1), (1, 1)),
            ((9, 3), (2, 1), (1, 1)),
            ((9, 3), (2, 1), (1, 2)),
            ((9, 3), (2, 1), (1, 4)),
            ((3, 3), (1, 1), (1, 1)),
        ]
        for i, (k, s, d) in enumerate(specs):
            pad = ((k[0] - 1) * d[0] // 2, (k[1] - 1) * d[1] // 2)
            x = WNConv(
                features=self.capacity,
                kernel_size=k,
                strides=s,
                padding=pad,
                dilation=d,
                name=f"conv_{i}",
            )(x)
            feats.append(x)
            x = jax.nn.leaky_relu(x, 0.2)
        y = WNConv(
            features=1,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=(1, 1),
            name="conv_out",
        )(x)
        feats.append(y)
        return feats


class MultiScaleSpectralDiscriminator(nn.Module):
    """Complex-STFT 2D critics (reference 139-153) using EncodecConvNet."""

    scales: Tuple[int, ...]
    capacity: int = 32

    @nn.compact
    def __call__(self, x):
        feats = []
        B, T, C = x.shape
        flat = x.swapaxes(1, 2).reshape(-1, T)  # [B*C, T]
        for i, scale in enumerate(self.scales):
            s = stft(flat, scale, scale // 4, center=False, normalized=True)
            s = s.reshape(B, C, s.shape[1], s.shape[2])  # [B, C, frames, bins]
            img = jnp.concatenate([s.real, s.imag], axis=1)  # [B, 2C, F, bins]
            img = img.transpose(0, 3, 2, 1).astype(x.dtype)  # [B, bins, frames, 2C]
            feats.append(
                EncodecConvNet(capacity=self.capacity, name=f"enc_{scale}_{i}")(img)
            )
        return feats


class CombineDiscriminators(nn.Module):
    """Concatenates the feature lists of several discriminators
    (reference 198-209)."""

    discriminators: Tuple[Any, ...]

    def setup(self):
        self.subs = self.discriminators

    def __call__(self, x):
        feats = []
        for d in self.subs:
            feats.extend(d(x))
        return feats
