"""Encoder/generator building blocks (dual-mode, delay-tracked).

TPU-native re-design of the reference architecture zoo (rave/blocks.py):
  * v2 family: DilatedUnit residual stacks + strided up/down sampling
    (reference rave/blocks.py:83-112, 514-596, 599-714)
  * v1 family: multi-kernel ResidualStacks, BatchNorm encoder, three-branch
    generator (reference rave/blocks.py:48-164, 322-503)
  * filtered-noise synthesizers (reference rave/blocks.py:198-292)
  * latent families: variational / wasserstein / discrete / spherical
    (reference rave/blocks.py:717-849)
  * Snake activation and AdaIN (reference rave/blocks.py:852-926)

Everything is channels-last [B, T, C]; all layers expose `.delay`
(cumulative streaming delay, output-rate samples) and a `step` method.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.nn.combinators import AlignBranches, Lambda, Residual, Sequential, StreamDelay
from rave_tpu.nn.conv import (
    Conv1d,
    ConvTranspose1d,
    conv_delay,
    get_padding,
    stream_variable,
    tconv_delay,
)
from rave_tpu.nn.gru import GRU
from rave_tpu.ops.dsp import amp_to_impulse_response, fft_convolve, mod_sigmoid


# --------------------------------------------------------------------------
# pure delay algebra (mirrors the reference's cumulative_delay threading,
# rave/blocks.py passim; safe to call from any context — no module creation)
# --------------------------------------------------------------------------


def dilated_unit_delay(kernel_size: int, dilation: int, mode: str) -> int:
    return get_padding(kernel_size, 1, dilation, mode)[1]


def residual_layer_delay(kernel_size: int, dilations, mode: str) -> int:
    d = 0
    for dil in dilations:
        d = conv_delay(d, kernel_size, 1, dil, mode)
    return d


def residual_stack_delay(kernel_sizes, dilations_list, mode: str) -> int:
    return max(
        sum(residual_layer_delay(k, dils, mode) for dils in dilations_list)
        for k in kernel_sizes
    )


def noise_generator_delay(in_delay: int, ratios, mode: str) -> int:
    d = in_delay
    for r in ratios:
        d = conv_delay(d, 3, r, 1, mode)
    return d * int(np.prod(ratios))


def noise_generator_v2_delay(in_delay: int, ratios) -> int:
    d = in_delay
    for r in ratios:
        d = conv_delay(d, 2 * r, r, 1, "causal")
    return d * int(np.prod(ratios))


def encoder_v2_delay(
    in_delay: int, kernel_size: int, ratios, dilations, mode: str
) -> int:
    d = conv_delay(in_delay, 2 * kernel_size + 1, 1, 1, mode)
    for r, dils in zip(ratios, normalize_dilations(dilations, ratios)):
        for dil in dils:
            d += dilated_unit_delay(kernel_size, dil, mode)
        d = conv_delay(d, 2 * r, r, 1, mode)
    return conv_delay(d, kernel_size, 1, 1, mode)


def generator_v2_hidden_delay(kernel_size: int, ratios, dilations, mode: str) -> int:
    dilations_list = normalize_dilations(dilations, ratios)[::-1]
    d = conv_delay(0, kernel_size, 1, 1, mode)
    for r, dils in zip(ratios[::-1], dilations_list):
        d = tconv_delay(d, r, mode)
        for dil in dils:
            d += dilated_unit_delay(kernel_size, dil, mode)
    return d


def generator_v2_delay(
    kernel_size: int, ratios, dilations, mode: str,
    use_noise: bool, noise_ratios,
) -> int:
    d = generator_v2_hidden_delay(kernel_size, ratios, dilations, mode)
    wave_d = conv_delay(d, kernel_size * 2 + 1, 1, 1, mode) - d
    if use_noise:
        noise_d = noise_generator_v2_delay(d, noise_ratios) - d
        return d + max(wave_d, noise_d)
    return d + wave_d


def encoder_v1_delay(
    in_delay: int, ratios, repeat_layers: int, mode: str
) -> int:
    d = conv_delay(in_delay, 7, 1, 1, mode)
    for r in ratios:
        d = conv_delay(d, 2 * r + 1, r, 1, mode)
        for _ in range(repeat_layers - 1):
            d = conv_delay(d, 3, 1, 1, mode)
    return conv_delay(d, 5, 1, 1, mode)


def generator_v1_delay(
    ratios, res_kernel_sizes, res_dilations, loud_stride: int,
    use_noise: bool, noise_ratios, mode: str,
) -> int:
    d = conv_delay(0, 7, 1, 1, mode)
    for r in ratios:
        d = tconv_delay(d, r, mode) if r > 1 else conv_delay(d, 3, 1, 1, mode)
        d += residual_stack_delay(res_kernel_sizes, res_dilations, mode)
    branch = [
        conv_delay(d, 7, 1, 1, mode) - d,
        conv_delay(d, 2 * loud_stride + 1, loud_stride, 1, mode) * loud_stride - d,
    ]
    if use_noise:
        branch.append(noise_generator_delay(d, noise_ratios, mode) - d)
    return d + max(branch)


def leaky_relu(x):
    return jax.nn.leaky_relu(x, 0.2)


def unit_norm_vector_to_angles(x: jax.Array) -> jax.Array:
    """Unit hypersphere -> normalized angles in [-1, 1], channel axis last.

    Reference: rave/blocks.py:933-946 (exported spherical latents).
    [B, T, C] -> [B, T, C-1].
    """
    tail = jnp.sqrt(
        jnp.cumsum((x**2)[..., ::-1], axis=-1)[..., ::-1] + 1e-12
    )  # t_k = ||x[k:]||
    ang = jnp.arccos(jnp.clip(x[..., :-1] / tail[..., :-1], -1.0, 1.0))
    last = jnp.where(x[..., -1:] >= 0, ang[..., -1:], 2 * np.pi - ang[..., -1:])
    ang = jnp.concatenate([ang[..., :-1] / np.pi, last / (2 * np.pi)], axis=-1)
    return 2 * (ang - 0.5)


def angles_to_unit_norm_vector(angles: jax.Array) -> jax.Array:
    """Inverse of unit_norm_vector_to_angles (reference rave/blocks.py:949-963).
    [B, T, C-1] -> [B, T, C]."""
    a = (angles / 2 + 0.5) % 1
    a = jnp.concatenate(
        [a[..., :-1] * np.pi, a[..., -1:] * (2 * np.pi)], axis=-1
    )
    cos = jnp.cos(a)
    sin = jnp.cumprod(jnp.sin(a), axis=-1)
    cos = jnp.concatenate([cos, jnp.ones_like(cos[..., :1])], axis=-1)
    sin = jnp.concatenate([jnp.ones_like(sin[..., :1]), sin], axis=-1)
    return cos * sin


class Snake(nn.Module):
    """x + sin^2(alpha*x)/alpha with learnable per-channel alpha.

    Reference: rave/blocks.py:852-860.
    """

    dim: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.dim,))
        alpha = alpha.astype(x.dtype)
        return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)

    def step(self, x):
        return self(x)


class SampleNorm(nn.Module):
    """L2-normalize across channels. Reference: rave/blocks.py:25-28."""

    def __call__(self, x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    def step(self, x):
        return self(x)


def make_activation(name: str, dim: int):
    """Activation factory ('leaky_relu' | 'snake')."""
    if name == "leaky_relu":
        return Lambda(leaky_relu)
    if name == "snake":
        return Snake(dim=dim)
    raise ValueError(f"unknown activation {name}")


class BatchNorm1d(nn.Module):
    """BatchNorm over [B, T, C] with running stats; streaming always uses
    the running averages (inference)."""

    features: int
    train: bool = False

    def setup(self):
        self.bn = nn.BatchNorm(axis=-1, momentum=0.9, epsilon=1e-5)

    def __call__(self, x):
        return self.bn(x, use_running_average=not self.train)

    def step(self, x):
        return self.bn(x, use_running_average=True)


class AdaIN(nn.Module):
    """Adaptive instance normalization with inference-time running stats.

    Identity during training; at inference it can (a) learn per-batch-slot
    channel statistics of a source ('x') or target ('y') corpus and (b)
    transfer x-stats to y-stats. Buffers live in the 'adain' collection so
    exported artifacts can mutate them (reference: rave/blocks.py:863-926,
    export.py:110-113, 213-230).
    """

    dim: int
    train: bool = False
    max_batch: int = 8

    def setup(self):
        shape = (self.max_batch, 1, self.dim)
        init = lambda *a: None  # noqa: E731
        self.mean_x = self.variable("adain", "mean_x", jnp.zeros, shape)
        self.std_x = self.variable("adain", "std_x", jnp.ones, shape)
        self.mean_y = self.variable("adain", "mean_y", jnp.zeros, shape)
        self.std_y = self.variable("adain", "std_y", jnp.ones, shape)
        self.learn_x = self.variable("adain", "learn_x", jnp.zeros, (1,))
        self.learn_y = self.variable("adain", "learn_y", jnp.zeros, (1,))
        self.n_x = self.variable("adain", "num_update_x", jnp.zeros, (1,))
        self.n_y = self.variable("adain", "num_update_y", jnp.zeros, (1,))

    @property
    def delay(self) -> int:
        return 0

    def _apply(self, x):
        bs = x.shape[0]
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.std(x, axis=1, keepdims=True, ddof=1)

        learn_x = self.learn_x.value[0]
        learn_y = self.learn_y.value[0]
        n_x, n_y = self.n_x.value[0], self.n_y.value[0]

        def cma(target, source, n):
            return target.at[:bs].add((source - target[:bs]) / (n + 1))

        if self.is_mutable_collection("adain"):
            self.mean_y.value = jnp.where(
                learn_y > 0, cma(self.mean_y.value, mean, n_y), self.mean_y.value
            )
            self.std_y.value = jnp.where(
                learn_y > 0, cma(self.std_y.value, std, n_y), self.std_y.value
            )
            self.n_y.value = jnp.where(learn_y > 0, self.n_y.value + 1, self.n_y.value)

            upd_x = (learn_y <= 0) & (learn_x > 0)
            self.mean_x.value = jnp.where(
                upd_x, cma(self.mean_x.value, mean, n_x), self.mean_x.value
            )
            self.std_x.value = jnp.where(
                upd_x, cma(self.std_x.value, std, n_x), self.std_x.value
            )
            self.n_x.value = jnp.where(upd_x, self.n_x.value + 1, self.n_x.value)

        transfer = (
            (self.mean_x.value[:bs], self.std_x.value[:bs]),
            (self.mean_y.value[:bs], self.std_y.value[:bs]),
        )
        (mx, sx), (my, sy) = transfer
        x_t = (x - mx) / (sx + 1e-5) * sy + my
        do_transfer = (learn_y <= 0) & (self.n_x.value[0] > 0) & (self.n_y.value[0] > 0)
        return jnp.where(do_transfer, x_t, x)

    def __call__(self, x):
        if self.train:
            return x
        return self._apply(x)

    def step(self, x):
        return self._apply(x)


# --------------------------------------------------------------------------
# v2 family
# --------------------------------------------------------------------------


class DilatedUnit(nn.Module):
    """act -> dilated conv(k) -> act -> conv(1). Reference rave/blocks.py:83-112."""

    dim: int
    kernel_size: int
    dilation: int
    mode: str = "centered"
    weight_norm: bool = True
    activation: str = "leaky_relu"
    stream_batch: int = 1

    @property
    def inner_delay(self) -> int:
        return dilated_unit_delay(self.kernel_size, self.dilation, self.mode)

    def setup(self):
        conv1 = Conv1d(
            in_features=self.dim,
            features=self.dim,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            stream_batch=self.stream_batch,
        )
        conv2 = Conv1d(
            in_features=self.dim,
            features=self.dim,
            kernel_size=1,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            in_delay=conv1.delay,
            stream_batch=self.stream_batch,
        )
        self.net = Sequential(
            layers=(
                make_activation(self.activation, self.dim),
                conv1,
                make_activation(self.activation, self.dim),
                conv2,
            )
        )

    def __call__(self, x):
        return self.net(x)

    def step(self, x):
        return self.net.step(x)


class FusedDilatedResidual(Residual):
    """Residual(DilatedUnit) whose offline path runs the pallas fused
    kernel (ops/kernels/dilated_unit.py) when RAVE_TPU_PALLAS=1 on a TPU
    backend. Parameter tree and streaming path are identical to the plain
    Residual, so checkpoints are interchangeable."""

    def __call__(self, x):
        import os

        inner = self.inner
        use = (
            os.environ.get("RAVE_TPU_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu"
            and getattr(inner, "activation", None) == "leaky_relu"
        )
        if use:
            from rave_tpu.ops.kernels.dilated_unit import (
                fused_dilated_unit,
                pallas_supported,
            )

            conv1 = inner.net.layers[1]
            conv2 = inner.net.layers[3]
            if pallas_supported(
                conv1.in_features, conv1.kernel_size, conv1.dilation, x.shape[1]
            ):
                w1 = conv1.materialized_weight()
                w2 = conv2.materialized_weight()[0]
                l, r = conv1.pad
                return fused_dilated_unit(x, w1, w2, conv1.dilation, l, r)
        return super().__call__(x)


def residual_unit(
    dim: int,
    kernel_size: int,
    dilation: int,
    mode: str,
    weight_norm: bool,
    activation: str,
    stream_batch: int,
) -> Residual:
    unit = DilatedUnit(
        dim=dim,
        kernel_size=kernel_size,
        dilation=dilation,
        mode=mode,
        weight_norm=weight_norm,
        activation=activation,
        stream_batch=stream_batch,
    )
    return FusedDilatedResidual(
        inner=unit,
        inner_delay=unit.inner_delay,
        features=dim,
        stream_batch=stream_batch,
    )


def normalize_dilations(dilations, ratios):
    """[[1,3,9],...] per ratio (reference rave/blocks.py:506-511)."""
    if isinstance(dilations[0], int):
        dilations = [dilations for _ in ratios]
    return [tuple(d) for d in dilations]


class EncoderV2(nn.Module):
    """Dilated residual encoder with strided downsampling.

    Reference: rave/blocks.py:514-596. Input [B, T, data_size*n_channels]
    (multiband frames), output [B, T/prod(ratios), latent_size*n_out].
    """

    data_size: int
    capacity: int
    ratios: Tuple[int, ...]
    latent_size: int
    n_out: int
    kernel_size: int
    dilations: Tuple
    keep_dim: bool = False
    n_channels: int = 1
    mode: str = "centered"
    weight_norm: bool = True
    activation: str = "leaky_relu"
    use_adain: bool = False
    recurrent_layers: int = 0
    train: bool = False
    adain_max_batch: int = 8
    in_delay: int = 0
    stream_batch: int = 1

    def _build(self):
        dilations_list = normalize_dilations(self.dilations, self.ratios)
        layers = []
        conv0 = Conv1d(
            in_features=self.data_size * self.n_channels,
            features=self.capacity,
            kernel_size=2 * self.kernel_size + 1,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            in_delay=self.in_delay,
            stream_batch=self.stream_batch,
        )
        layers.append(conv0)
        delay = conv0.delay
        ch = self.capacity
        for r, dils in zip(self.ratios, dilations_list):
            for d in dils:
                if self.use_adain:
                    layers.append(
                        AdaIN(dim=ch, train=self.train, max_batch=self.adain_max_batch)
                    )
                res = residual_unit(
                    ch, self.kernel_size, d, self.mode, self.weight_norm,
                    self.activation, self.stream_batch,
                )
                layers.append(res)
                delay = delay + res.inner_delay
            layers.append(make_activation(self.activation, ch))
            out_ch = ch * r if self.keep_dim else ch * 2
            down = Conv1d(
                in_features=ch,
                features=out_ch,
                kernel_size=2 * r,
                stride=r,
                mode=self.mode,
                weight_norm=self.weight_norm,
                use_bias=False,
                in_delay=delay,
                stream_batch=self.stream_batch,
            )
            layers.append(down)
            delay = down.delay
            ch = out_ch

        layers.append(make_activation(self.activation, ch))
        final = Conv1d(
            in_features=ch,
            features=self.latent_size * self.n_out,
            kernel_size=self.kernel_size,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            in_delay=delay,
            stream_batch=self.stream_batch,
        )
        layers.append(final)
        if self.recurrent_layers:
            layers.append(
                GRU(
                    latent_size=self.latent_size * self.n_out,
                    num_layers=self.recurrent_layers,
                    stream_batch=self.stream_batch,
                )
            )
        return tuple(layers), final.delay

    def setup(self):
        self.net = Sequential(layers=self._build()[0])

    @property
    def delay(self) -> int:
        return encoder_v2_delay(
            self.in_delay, self.kernel_size, self.ratios, self.dilations, self.mode
        )

    def __call__(self, x):
        return self.net(x)

    def step(self, x):
        return self.net.step(x)


class NoiseGeneratorV2(nn.Module):
    """Causal filtered-noise synth: conv pyramid -> band amplitudes ->
    windowed IRs -> FFT-convolved uniform noise (frame-local).

    Reference: rave/blocks.py:243-292. Input [B, T, in_size] at wave rate;
    output [B, T, data_size*n_channels]. All convs are causal (pad (r,0)),
    so the delay contribution is 0 when in_delay == 0.
    """

    in_size: int
    hidden_size: int
    data_size: int
    ratios: Tuple[int, ...]
    noise_bands: int
    n_channels: int = 1
    activation: str = "leaky_relu"
    in_delay: int = 0
    stream_batch: int = 1

    def _chans(self):
        chans = [self.in_size]
        chans += (len(self.ratios) - 1) * [self.hidden_size]
        chans.append(self.data_size * self.noise_bands * self.n_channels)
        return chans

    @property
    def delay(self) -> int:
        return noise_generator_v2_delay(self.in_delay, self.ratios)

    def setup(self):
        chans = self._chans()
        layers = []
        d = self.in_delay
        for i, r in enumerate(self.ratios):
            conv = Conv1d(
                in_features=chans[i],
                features=chans[i + 1],
                kernel_size=2 * r,
                stride=r,
                mode="causal",
                use_bias=False,
                in_delay=d,
                stream_batch=self.stream_batch,
            )
            layers.append(conv)
            d = conv.delay
            if i != len(self.ratios) - 1:
                layers.append(make_activation(self.activation, chans[i + 1]))
        self.net = Sequential(layers=tuple(layers))
        self.target_size = int(np.prod(self.ratios))

    def _synth(self, amp):
        """amp [B, F, data_size*noise_bands*n_ch] -> [B, F*target, data*n_ch]."""
        B, F, _ = amp.shape
        d = self.data_size * self.n_channels
        amp = mod_sigmoid(amp - 5.0)
        amp = amp.reshape(B, F, d, self.noise_bands)
        ir = amp_to_impulse_response(amp, self.target_size)
        noise = (
            jax.random.uniform(self.make_rng("noise"), ir.shape, ir.dtype) * 2 - 1
        )
        out = fft_convolve(noise, ir)  # [B, F, d, target]
        out = out.swapaxes(2, 3).reshape(B, F * self.target_size, d)
        return out

    def __call__(self, x):
        return self._synth(self.net(x))

    def step(self, x):
        return self._synth(self.net.step(x))


class GeneratorV2(nn.Module):
    """Mirror decoder: transpose-conv upsampling + dilated residual units,
    optional amplitude modulation and filtered-noise branch.

    Reference: rave/blocks.py:599-714. Input [B, T_latent, latent_size];
    output [B, T_wave_frames, data_size*n_channels] (multiband frames when
    output_mode == 'pqmf').
    """

    latent_size: int
    capacity: int
    ratios: Tuple[int, ...]
    kernel_size: int
    dilations: Tuple
    data_size: int = 0  # 0 -> n_channels
    keep_dim: bool = False
    n_channels: int = 1
    amplitude_modulation: bool = False
    use_noise: bool = False
    noise_hidden: int = 64
    noise_ratios: Tuple[int, ...] = (4, 4, 4)
    noise_bands: int = 5
    mode: str = "centered"
    weight_norm: bool = True
    activation: str = "leaky_relu"
    use_adain: bool = False
    recurrent_layers: int = 0
    train: bool = False
    adain_max_batch: int = 8
    stream_batch: int = 1

    @property
    def out_data_size(self) -> int:
        return (self.data_size or 1) * self.n_channels

    def _build(self):
        dilations_list = normalize_dilations(self.dilations, self.ratios)[::-1]
        ratios = self.ratios[::-1]
        if self.keep_dim:
            ch = int(np.prod(self.ratios)) * self.capacity
        else:
            ch = 2 ** len(self.ratios) * self.capacity

        layers = []
        delay = 0
        if self.recurrent_layers:
            layers.append(
                GRU(
                    latent_size=self.latent_size,
                    num_layers=self.recurrent_layers,
                    stream_batch=self.stream_batch,
                )
            )
        conv0 = Conv1d(
            in_features=self.latent_size,
            features=ch,
            kernel_size=self.kernel_size,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            stream_batch=self.stream_batch,
        )
        layers.append(conv0)
        delay = conv0.delay

        for r, dils in zip(ratios, dilations_list):
            out_ch = ch // r if self.keep_dim else ch // 2
            layers.append(make_activation(self.activation, ch))
            up = ConvTranspose1d(
                in_features=ch,
                features=out_ch,
                ratio=r,
                mode=self.mode,
                weight_norm=self.weight_norm,
                use_bias=False,
                in_delay=delay,
                stream_batch=self.stream_batch,
            )
            layers.append(up)
            delay = up.delay
            ch = out_ch
            for d in dils:
                if self.use_adain:
                    layers.append(
                        AdaIN(dim=ch, train=self.train, max_batch=self.adain_max_batch)
                    )
                res = residual_unit(
                    ch, self.kernel_size, d, self.mode, self.weight_norm,
                    self.activation, self.stream_batch,
                )
                layers.append(res)
                delay = delay + res.inner_delay

        layers.append(make_activation(self.activation, ch))

        wave_out = (
            self.out_data_size * 2 if self.amplitude_modulation else self.out_data_size
        )
        waveform = Conv1d(
            in_features=ch,
            features=wave_out,
            kernel_size=self.kernel_size * 2 + 1,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            in_delay=delay,
            stream_batch=self.stream_batch,
        )
        synth = None
        if self.use_noise:
            noise = NoiseGeneratorV2(
                in_size=ch,
                hidden_size=self.noise_hidden,
                data_size=self.data_size or 1,
                ratios=self.noise_ratios,
                noise_bands=self.noise_bands,
                n_channels=self.n_channels,
                activation=self.activation,
                in_delay=delay,
                stream_batch=self.stream_batch,
            )
            # Align waveform and noise branches in streaming mode (own
            # contributions relative to the shared hidden stream).
            wave_d = waveform.delay - delay
            noise_d = noise.delay - delay
            synth = AlignBranches(
                branches=(waveform, noise),
                delays=(wave_d, noise_d),
                features=(wave_out, self.out_data_size),
                stream_batch=self.stream_batch,
            )
            out_delay = delay + max(wave_d, noise_d)
        else:
            out_delay = waveform.delay
        return tuple(layers), waveform, synth, out_delay

    def setup(self):
        layers, waveform, synth, _ = self._build()
        self.net = Sequential(layers=layers)
        if synth is not None:
            self.synth = synth
        else:
            self.waveform = waveform

    @property
    def delay(self) -> int:
        return generator_v2_delay(
            self.kernel_size, self.ratios, self.dilations, self.mode,
            self.use_noise, self.noise_ratios,
        )

    def _mix(self, wave, noise):
        if self.amplitude_modulation:
            wave, amp = jnp.split(wave, 2, axis=-1)
            wave = wave * jax.nn.sigmoid(amp)
        return jnp.tanh(wave + noise)

    def __call__(self, z):
        h = self.net(z)
        if self.use_noise:
            wave, noise = self.synth(h)
        else:
            wave, noise = self.waveform(h), 0.0
        return self._mix(wave, noise)

    def step(self, z):
        h = self.net.step(z)
        if self.use_noise:
            wave, noise = self.synth.step(h)
        else:
            wave, noise = self.waveform.step(h), 0.0
        return self._mix(wave, noise)


# --------------------------------------------------------------------------
# v1 family
# --------------------------------------------------------------------------


class ResidualLayer(nn.Module):
    """Residual chain of (act, dilated conv) pairs (reference 48-80)."""

    dim: int
    kernel_size: int
    dilations: Tuple[int, ...]
    mode: str = "centered"
    weight_norm: bool = True
    activation: str = "leaky_relu"
    stream_batch: int = 1

    @property
    def inner_delay(self) -> int:
        return residual_layer_delay(self.kernel_size, self.dilations, self.mode)

    def setup(self):
        layers = []
        d = 0
        for dil in self.dilations:
            layers.append(make_activation(self.activation, self.dim))
            conv = Conv1d(
                in_features=self.dim,
                features=self.dim,
                kernel_size=self.kernel_size,
                dilation=dil,
                mode=self.mode,
                weight_norm=self.weight_norm,
                use_bias=False,
                in_delay=d,
                stream_batch=self.stream_batch,
            )
            layers.append(conv)
            d = conv.delay
        self.net = Residual(
            inner=Sequential(layers=tuple(layers)),
            inner_delay=d,
            features=self.dim,
            stream_batch=self.stream_batch,
        )

    def __call__(self, x):
        return self.net(x)

    def step(self, x):
        return self.net.step(x)


class ResidualStack(nn.Module):
    """Sum of per-kernel-size residual blocks, delay-aligned
    (reference 115-164)."""

    dim: int
    kernel_sizes: Tuple[int, ...]
    dilations_list: Tuple[Tuple[int, ...], ...]
    mode: str = "centered"
    weight_norm: bool = True
    activation: str = "leaky_relu"
    stream_batch: int = 1

    def _block(self, k: int) -> Tuple[Any, int]:
        layers, d = [], 0
        for dils in self.dilations_list:
            rl = ResidualLayer(
                dim=self.dim,
                kernel_size=k,
                dilations=tuple(dils),
                mode=self.mode,
                weight_norm=self.weight_norm,
                activation=self.activation,
                stream_batch=self.stream_batch,
            )
            layers.append(rl)
            d += rl.inner_delay
        return Sequential(layers=tuple(layers)), d

    @property
    def inner_delay(self) -> int:
        return max(self._block_delays())

    def _block_delays(self):
        return [
            sum(
                residual_layer_delay(k, tuple(dils), self.mode)
                for dils in self.dilations_list
            )
            for k in self.kernel_sizes
        ]

    def setup(self):
        blocks_, delays = [], []
        for k in self.kernel_sizes:
            b, d = self._block(k)
            blocks_.append(b)
            delays.append(d)
        self.aligned = AlignBranches(
            branches=tuple(blocks_),
            delays=tuple(delays),
            features=tuple(self.dim for _ in blocks_),
            stream_batch=self.stream_batch,
        )

    def __call__(self, x):
        return sum(self.aligned(x))

    def step(self, x):
        return sum(self.aligned.step(x))


class UpsampleLayer(nn.Module):
    """act + (ConvTranspose(2r, r) if r>1 else Conv(3)) (reference 167-195)."""

    in_dim: int
    out_dim: int
    ratio: int
    mode: str = "centered"
    weight_norm: bool = True
    activation: str = "leaky_relu"
    in_delay: int = 0
    stream_batch: int = 1

    @property
    def delay(self) -> int:
        if self.ratio > 1:
            return tconv_delay(self.in_delay, self.ratio, self.mode)
        return conv_delay(self.in_delay, 3, 1, 1, self.mode)

    def _conv(self):
        if self.ratio > 1:
            return ConvTranspose1d(
                in_features=self.in_dim,
                features=self.out_dim,
                ratio=self.ratio,
                mode=self.mode,
                weight_norm=self.weight_norm,
                use_bias=False,
                in_delay=self.in_delay,
                stream_batch=self.stream_batch,
            )
        return Conv1d(
            in_features=self.in_dim,
            features=self.out_dim,
            kernel_size=3,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            in_delay=self.in_delay,
            stream_batch=self.stream_batch,
        )

    def setup(self):
        self.net = Sequential(
            layers=(make_activation(self.activation, self.in_dim), self._conv())
        )

    def __call__(self, x):
        return self.net(x)

    def step(self, x):
        return self.net.step(x)


class NoiseGenerator(nn.Module):
    """v1 filtered-noise synth: centered strided convs -> band amplitudes ->
    IR -> FFT-convolved noise (reference 198-240)."""

    in_size: int
    data_size: int
    ratios: Tuple[int, ...] = (4, 4, 4)
    noise_bands: int = 5
    mode: str = "centered"
    in_delay: int = 0
    stream_batch: int = 1

    @property
    def delay(self) -> int:
        return noise_generator_delay(self.in_delay, self.ratios, self.mode)

    def setup(self):
        chans = [self.in_size] * len(self.ratios) + [self.data_size * self.noise_bands]
        layers = []
        d = self.in_delay
        for i, r in enumerate(self.ratios):
            conv = Conv1d(
                in_features=chans[i],
                features=chans[i + 1],
                kernel_size=3,
                stride=r,
                mode=self.mode,
                use_bias=False,
                in_delay=d,
                stream_batch=self.stream_batch,
            )
            layers.append(conv)
            d = conv.delay
            if i != len(self.ratios) - 1:
                layers.append(Lambda(leaky_relu))
        self.net = Sequential(layers=tuple(layers))
        self.target_size = int(np.prod(self.ratios))

    def _synth(self, amp):
        B, F, _ = amp.shape
        amp = mod_sigmoid(amp - 5.0)
        amp = amp.reshape(B, F, self.data_size, self.noise_bands)
        ir = amp_to_impulse_response(amp, self.target_size)
        noise = (
            jax.random.uniform(self.make_rng("noise"), ir.shape, ir.dtype) * 2 - 1
        )
        out = fft_convolve(noise, ir)
        return out.swapaxes(2, 3).reshape(B, F * self.target_size, self.data_size)

    def __call__(self, x):
        return self._synth(self.net(x))

    def step(self, x):
        return self._synth(self.net.step(x))


class EncoderV1(nn.Module):
    """Strided conv encoder with BatchNorm (reference 424-503)."""

    data_size: int
    capacity: int
    latent_size: int
    ratios: Tuple[int, ...]
    n_out: int
    sample_norm: bool = False
    repeat_layers: int = 1
    n_channels: int = 1
    recurrent_layers: int = 0
    mode: str = "centered"
    train: bool = False
    in_delay: int = 0
    stream_batch: int = 1

    def _build(self):
        layers = []
        conv0 = Conv1d(
            in_features=self.data_size * self.n_channels,
            features=self.capacity,
            kernel_size=7,
            mode=self.mode,
            use_bias=False,
            in_delay=self.in_delay,
            stream_batch=self.stream_batch,
        )
        layers.append(conv0)
        d = conv0.delay
        dim = self.capacity
        for r in self.ratios:
            out_dim = 2 * dim
            layers.append(
                SampleNorm() if self.sample_norm
                else BatchNorm1d(features=dim, train=self.train)
            )
            layers.append(Lambda(leaky_relu))
            conv = Conv1d(
                in_features=dim,
                features=out_dim,
                kernel_size=2 * r + 1,
                stride=r,
                mode=self.mode,
                use_bias=False,
                in_delay=d,
                stream_batch=self.stream_batch,
            )
            layers.append(conv)
            d = conv.delay
            for _ in range(self.repeat_layers - 1):
                layers.append(
                    SampleNorm() if self.sample_norm
                    else BatchNorm1d(features=out_dim, train=self.train)
                )
                layers.append(Lambda(leaky_relu))
                conv = Conv1d(
                    in_features=out_dim,
                    features=out_dim,
                    kernel_size=3,
                    mode=self.mode,
                    use_bias=False,
                    in_delay=d,
                    stream_batch=self.stream_batch,
                )
                layers.append(conv)
                d = conv.delay
            dim = out_dim
        layers.append(Lambda(leaky_relu))
        if self.recurrent_layers:
            layers.append(
                GRU(
                    latent_size=dim,
                    num_layers=self.recurrent_layers,
                    stream_batch=self.stream_batch,
                )
            )
            layers.append(Lambda(leaky_relu))
        final = Conv1d(
            in_features=dim,
            features=self.latent_size * self.n_out,
            kernel_size=5,
            groups=self.n_out,
            mode=self.mode,
            use_bias=False,
            in_delay=d,
            stream_batch=self.stream_batch,
        )
        layers.append(final)
        return tuple(layers), final.delay

    def setup(self):
        self.net = Sequential(layers=self._build()[0])

    @property
    def delay(self) -> int:
        return encoder_v1_delay(
            self.in_delay, self.ratios, self.repeat_layers, self.mode
        )

    def __call__(self, x):
        return self.net(x)

    def step(self, x):
        return self.net.step(x)


class GeneratorV1(nn.Module):
    """Three-branch v1 synth: wave * mod_sigmoid(loudness) + noise
    (reference 322-421)."""

    latent_size: int
    capacity: int
    data_size: int
    ratios: Tuple[int, ...]
    loud_stride: int = 1
    use_noise: bool = True
    noise_ratios: Tuple[int, ...] = (4, 4, 4)
    noise_bands: int = 5
    res_kernel_sizes: Tuple[int, ...] = (3,)
    res_dilations: Tuple[Tuple[int, ...], ...] = ((1, 1), (3, 1), (5, 1))
    n_channels: int = 1
    recurrent_layers: int = 0
    mode: str = "centered"
    weight_norm: bool = True
    activation: str = "leaky_relu"
    stream_batch: int = 1

    def _build(self):
        layers = []
        ch = 2 ** len(self.ratios) * self.capacity
        conv0 = Conv1d(
            in_features=self.latent_size,
            features=ch,
            kernel_size=7,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            stream_batch=self.stream_batch,
        )
        layers.append(conv0)
        d = conv0.delay
        if self.recurrent_layers:
            layers.append(
                GRU(latent_size=ch, num_layers=self.recurrent_layers,
                    stream_batch=self.stream_batch)
            )
        for r in self.ratios:
            out_ch = ch // 2
            up = UpsampleLayer(
                in_dim=ch,
                out_dim=out_ch,
                ratio=r,
                mode=self.mode,
                weight_norm=self.weight_norm,
                activation=self.activation,
                in_delay=d,
                stream_batch=self.stream_batch,
            )
            layers.append(up)
            d = up.delay
            stack = ResidualStack(
                dim=out_ch,
                kernel_sizes=self.res_kernel_sizes,
                dilations_list=self.res_dilations,
                mode=self.mode,
                weight_norm=self.weight_norm,
                activation=self.activation,
                stream_batch=self.stream_batch,
            )
            layers.append(stack)
            d = d + stack.inner_delay
            ch = out_ch
        net = Sequential(layers=tuple(layers))

        wave_gen = Conv1d(
            in_features=ch,
            features=self.data_size * self.n_channels,
            kernel_size=7,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            in_delay=d,
            stream_batch=self.stream_batch,
        )
        loud_gen = Conv1d(
            in_features=ch,
            features=1,
            kernel_size=2 * self.loud_stride + 1,
            stride=self.loud_stride,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=False,
            in_delay=d,
            stream_batch=self.stream_batch,
        )
        branches = [wave_gen, loud_gen]
        delays = [wave_gen.delay - d, loud_gen.delay * self.loud_stride - d]
        feats = [self.data_size * self.n_channels, 1]
        if self.use_noise:
            noise_gen = NoiseGenerator(
                in_size=ch,
                data_size=self.data_size * self.n_channels,
                ratios=self.noise_ratios,
                noise_bands=self.noise_bands,
                mode=self.mode,
                in_delay=d,
                stream_batch=self.stream_batch,
            )
            branches.append(noise_gen)
            delays.append(noise_gen.delay - d)
            feats.append(self.data_size * self.n_channels)
        synth = AlignBranches(
            branches=tuple(branches),
            delays=tuple(delays),
            features=tuple(feats),
            stream_batch=self.stream_batch,
        )
        return net, synth, d + max(delays)

    def setup(self):
        self.net, self.synth, _ = self._build()

    @property
    def delay(self) -> int:
        return generator_v1_delay(
            self.ratios, self.res_kernel_sizes, self.res_dilations,
            self.loud_stride, self.use_noise, self.noise_ratios, self.mode,
        )

    def _mix(self, outs, warmed_up: bool):
        if self.use_noise:
            wave, loud, noise = outs
        else:
            (wave, loud), noise = outs, 0.0
        if self.loud_stride != 1:
            loud = jnp.repeat(loud, self.loud_stride, axis=1)
        y = jnp.tanh(wave) * mod_sigmoid(loud)
        if warmed_up and self.use_noise:
            y = y + noise
        return y

    def __call__(self, z, warmed_up: bool = True):
        return self._mix(self.synth(self.net(z)), warmed_up)

    def step(self, z):
        return self._mix(self.synth.step(self.net.step(z)), True)


# --------------------------------------------------------------------------
# latent families
# --------------------------------------------------------------------------


class VariationalEncoder(nn.Module):
    """Gaussian reparameterization + closed-form KL.

    Reference: rave/blocks.py:717-745. `encoder` outputs 2*latent channels
    (mean ++ scale); std = softplus(scale) + 1e-4.
    """

    encoder: Any
    beta: float = 1.0

    @property
    def delay(self) -> int:
        return self.encoder.delay

    @property
    def num_out(self) -> int:
        return 2

    def __call__(self, x, warmed_up: bool = False):
        z = self.encoder(x)
        if warmed_up:
            z = jax.lax.stop_gradient(z)
        return z

    def step(self, x):
        return self.encoder.step(x)

    def reparametrize(self, z, rng=None):
        mean, scale = jnp.split(z, 2, axis=-1)
        std = jax.nn.softplus(scale) + 1e-4
        var = std * std
        logvar = jnp.log(var)
        if rng is None:
            rng = self.make_rng("noise")
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        zs = mean + std * eps
        kl = jnp.mean(jnp.sum(mean * mean + var - logvar - 1, axis=-1))
        return zs, self.beta * kl


class WassersteinEncoder(nn.Module):
    """MMD (RBF kernel) regularization against N(0,1).

    Reference: rave/blocks.py:748-791.
    """

    encoder: Any
    noise_augmentation: int = 0

    @property
    def delay(self) -> int:
        return self.encoder.delay

    @property
    def num_out(self) -> int:
        return 1

    def __call__(self, x, warmed_up: bool = False):
        z = self.encoder(x)
        if warmed_up:
            z = jax.lax.stop_gradient(z)
        return z

    def step(self, x):
        return self.encoder.step(x)

    @staticmethod
    def _mean_kernel(x, y):
        k = jnp.mean((x[:, None] - y[None]) ** 2, axis=-1) / x.shape[-1]
        return jnp.mean(jnp.exp(-k))

    def reparametrize(self, z, rng=None):
        flat = z.reshape(-1, z.shape[-1])
        if rng is None:
            rng = self.make_rng("noise")
        rng, r2 = jax.random.split(rng)
        ref = jax.random.normal(rng, flat.shape, flat.dtype)
        mmd = (
            self._mean_kernel(flat, flat)
            + self._mean_kernel(ref, ref)
            - 2 * self._mean_kernel(flat, ref)
        )
        if self.noise_augmentation:
            noise = jax.random.normal(
                r2, (z.shape[0], z.shape[1], self.noise_augmentation), z.dtype
            )
            z = jnp.concatenate([z, noise], axis=-1)
        return z, mmd


class DiscreteEncoder(nn.Module):
    """RVQ latent family with a schedule-controlled `enabled` gate and
    optional noise augmentation.

    Reference: rave/blocks.py:794-830. The gate is a *static* argument so
    each training phase compiles to a dedicated XLA program (no dead RVQ
    compute pre-warmup).
    """

    encoder: Any
    num_quantizers: int
    codebook_size: int
    latent_size: int
    noise_augmentation: int = 0

    @property
    def delay(self) -> int:
        return self.encoder.delay

    @property
    def num_out(self) -> int:
        return 1

    def setup(self):
        from rave_tpu.models.quantization import ResidualVectorQuantization

        self.rvq = ResidualVectorQuantization(
            num_quantizers=self.num_quantizers,
            dim=self.latent_size,
            codebook_size=self.codebook_size,
        )

    def __call__(self, x, warmed_up: bool = False):
        z = self.encoder(x)
        if warmed_up:
            z = jax.lax.stop_gradient(z)
        return z

    def step(self, x):
        return self.encoder.step(x)

    def reparametrize(
        self, z, rng=None, enabled: bool = True, train: bool = False
    ):
        if rng is None:
            rng = self.make_rng("noise")
        rng, r2 = jax.random.split(rng)
        if enabled:
            z, diff, _ = self.rvq(z, train=train, rng=rng)
        else:
            diff = jnp.asarray(0.0, jnp.float32)
        if self.noise_augmentation:
            noise = jax.random.normal(
                r2, (z.shape[0], z.shape[1], self.noise_augmentation), z.dtype
            )
            z = jnp.concatenate([z, noise], axis=-1)
        return z, diff

    def encode_indices(self, z):
        return self.rvq.encode(z)

    def decode_indices(self, idx):
        return self.rvq.decode(idx)


class SphericalEncoder(nn.Module):
    """L2-normalized latents, zero regularization.

    Reference: rave/blocks.py:833-849.
    """

    encoder: Any

    @property
    def delay(self) -> int:
        return self.encoder.delay

    @property
    def num_out(self) -> int:
        return 1

    def __call__(self, x, warmed_up: bool = False):
        return self.encoder(x)

    def step(self, x):
        return self.encoder.step(x)

    def reparametrize(self, z, rng=None):
        zn = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return zn, jnp.asarray(0.0, z.dtype)
