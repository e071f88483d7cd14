"""Descript-audio-codec style discriminator (MPD + MSD + MRD).

Capability-parity re-design of the reference port
(rave/descript_discriminator.py): period-folded 2D critics, grouped 1D
critics with kaiser-filter downsampling, and multi-band STFT critics.
Channels-last throughout; LeakyReLU(0.1) between convs.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.models.discriminators import WNConv
from rave_tpu.ops.pqmf import kaiser_filter
from rave_tpu.ops.stft import stft

BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


def _fold_apply(conv: WNConv, x):
    """Apply a (k, 1)-kernel 2D-layout WNConv to a period-folded
    [B*p, T, C] input as the equivalent 1D conv (same params, same math)."""
    w, b = conv.weights(x.shape[-1])
    y = jax.lax.conv_general_dilated(
        x,
        w[:, 0].astype(x.dtype),
        window_strides=conv.strides[:1],
        padding=((conv.padding[0], conv.padding[0]),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + b.astype(y.dtype)


class MPD(nn.Module):
    """Period-folded 2D critic (reference descript_discriminator.py:30-66).

    `packed=True` moves the period axis into the batch and runs the stack
    as 1D convs on [B*p, T/p, C] — exactly the same values ((k, 1) kernels
    never mix the period axis; see
    models/discriminators.py MultiPeriodDiscriminator), feature maps
    batch-major-permuted (all consumers are elementwise means over a
    real/fake split the fold preserves)."""

    period: int
    packed: bool = True

    @nn.compact
    def __call__(self, x):
        # x [B, T, C] -> [B, T/p, p, C]
        t = x.shape[1]
        pad = (self.period - t % self.period) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(x.shape[0], -1, self.period, x.shape[-1])
        if self.packed:
            x = x.transpose(0, 2, 1, 3).reshape(
                x.shape[0] * self.period, -1, x.shape[-1]
            )
        fmap = []
        chans = [32, 128, 512, 1024, 1024]
        strides = [(3, 1)] * 4 + [(1, 1)]
        for i, (c, s) in enumerate(zip(chans, strides)):
            conv = WNConv(
                features=c, kernel_size=(5, 1), strides=s, padding=(2, 0),
                name=f"conv_{i}",
            )
            x = _fold_apply(conv, x) if self.packed else conv(x)
            fmap.append(x)
            x = jax.nn.leaky_relu(x, 0.1)
        conv = WNConv(
            features=1, kernel_size=(3, 1), strides=(1, 1), padding=(1, 0),
            name="post",
        )
        y = _fold_apply(conv, x) if self.packed else conv(x)
        fmap.append(y)
        return fmap


class MSD(nn.Module):
    """Grouped 1D critic with kaiser anti-aliased downsampling
    (reference descript_discriminator.py:69-112)."""

    scale: int = 1

    @nn.compact
    def __call__(self, x):
        if self.scale != 1:
            filt = kaiser_filter(np.pi / self.scale, 140)
            if not len(filt) % 2:
                filt = np.pad(filt, (1, 0))
            w = jnp.asarray(filt, x.dtype)[:, None, None]  # [K, 1, 1]
            C = x.shape[-1]
            w = jnp.tile(w, (1, 1, C))
            x = jax.lax.conv_general_dilated(
                x, w, (self.scale,), ((len(filt) // 2, len(filt) // 2),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=C,
            )
        fmap = []
        spec = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (c, k, s, g, p) in enumerate(spec):
            x = WNConv(
                features=c, kernel_size=(k,), strides=(s,), padding=(p,),
                groups=g, name=f"conv_{i}",
            )(x)
            fmap.append(x)
            x = jax.nn.leaky_relu(x, 0.1)
        y = WNConv(
            features=1, kernel_size=(3,), strides=(1,), padding=(1,), name="post"
        )(x)
        fmap.append(y)
        return fmap


MRD_SPEC = (
    ((3, 9), (1, 1), (1, 4)),
    ((3, 9), (1, 2), (1, 4)),
    ((3, 9), (1, 2), (1, 4)),
    ((3, 9), (1, 2), (1, 4)),
    ((3, 3), (1, 1), (1, 1)),
)


class MRD(nn.Module):
    """Multi-band STFT 2D critic (reference descript_discriminator.py:118-184).

    `packed=True` (default) runs the band conv stacks frequency-packed
    (ops/packed_conv.py): numerically equivalent to the per-band layout
    (same params, fmaps unpacked to the original geometry) but ~6x faster
    fwd+bwd on TPU, where 32-channel spatial convs run at ~6% MFU.
    """

    window_length: int
    hop_factor: float = 0.25
    bands: Tuple = BANDS
    packed: bool = True
    packed_fmaps: bool = False

    @nn.compact
    def __call__(self, x):
        from rave_tpu.ops import packed_conv as pc

        B, T, C = x.shape
        flat = x.swapaxes(1, 2).reshape(B * C, T)
        s = stft(flat, self.window_length, int(self.hop_factor * self.window_length))
        # [B*C, frames, bins] -> [B, frames, bins, 2C]
        s = s.reshape(B, C, s.shape[1], s.shape[2])
        img = jnp.concatenate([s.real, s.imag], axis=1).transpose(0, 2, 3, 1)
        # keep the conv stack in the caller's compute dtype (bf16_dis)
        img = img.astype(x.dtype)
        n_fft = self.window_length // 2 + 1
        bands = [(int(a * n_fft), int(b * n_fft)) for a, b in self.bands]

        fmap, outs = [], []
        for bi, (lo, hi) in enumerate(bands):
            band = img[:, :, lo:hi, :]
            if self.packed:
                nb = hi - lo
                xp = pc.pack_freq(band)
                for li, (k, st, p) in enumerate(MRD_SPEC):
                    conv = WNConv(
                        features=32, kernel_size=k, strides=st, padding=p,
                        name=f"band{bi}_conv{li}",
                    )
                    w, b = conv.weights(xp.shape[-1] // pc.PACK)
                    xp = pc.packed_conv(
                        xp, w, b, n_bins_in=nb,
                        stride_t=st[0], stride_f=st[1], pad_t=p[0], pad_f=p[1],
                    )
                    nb = pc.out_bins(nb, k[1], st[1], p[1])
                    # zero the pack-alignment tail bins: the original conv
                    # sees zero padding there, and they feed the next
                    # layer's edge outputs
                    G = xp.shape[2]
                    if G * pc.PACK != nb:
                        mask = (np.arange(G * pc.PACK) < nb).reshape(G, pc.PACK)
                        mask = np.repeat(mask, 32, axis=1)[None, None]
                        xp = xp * jnp.asarray(mask, xp.dtype)
                    # packed_fmaps skips the per-layer unpack copy — valid
                    # when the consumer's feature-matching distance is
                    # count-invariant (relative mean_difference: sum/sum, so
                    # the masked zero pad bins cancel exactly; train/steps.py
                    # uses it only with feature_matching_relative)
                    fmap.append(xp if self.packed_fmaps else pc.unpack_freq(xp, nb))
                    xp = jax.nn.leaky_relu(xp, 0.1)
                band = pc.unpack_freq(xp, nb)
            else:
                for li, (k, st, p) in enumerate(MRD_SPEC):
                    band = WNConv(
                        features=32, kernel_size=k, strides=st, padding=p,
                        name=f"band{bi}_conv{li}",
                    )(band)
                    fmap.append(band)
                    band = jax.nn.leaky_relu(band, 0.1)
            outs.append(band)
        y = jnp.concatenate(outs, axis=2)
        y = WNConv(
            features=1, kernel_size=(3, 3), strides=(1, 1), padding=(1, 1),
            name="post",
        )(y)
        fmap.append(y)
        return fmap


class DescriptDiscriminator(nn.Module):
    """MPDs + MSDs + MRDs with DC-removal + 0.8 peak-normalize preprocess
    (reference descript_discriminator.py:187-217)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    rates: Tuple[int, ...] = ()
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    bands: Tuple = BANDS
    packed_fmaps: bool = False

    @nn.compact
    def __call__(self, x):
        x = x - jnp.mean(x, axis=1, keepdims=True)
        x = 0.8 * x / (jnp.max(jnp.abs(x), axis=1, keepdims=True) + 1e-9)
        feats = []
        for p in self.periods:
            feats.append(MPD(period=p, name=f"mpd_{p}")(x))
        for r in self.rates:
            feats.append(MSD(scale=r, name=f"msd_{r}")(x))
        for f in self.fft_sizes:
            feats.append(
                MRD(
                    window_length=f, bands=self.bands,
                    packed_fmaps=self.packed_fmaps, name=f"mrd_{f}",
                )(x)
            )
        return feats
