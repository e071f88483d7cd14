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
from rave_tpu.nn.conv import Conv1d, ConvTranspose1d, stream_variable
from rave_tpu.nn.gru import GRU
from rave_tpu.ops.dsp import amp_to_impulse_response, fft_convolve, mod_sigmoid


def leaky_relu(x):
    return jax.nn.leaky_relu(x, 0.2)


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
        self.bn = nn.BatchNorm(
            use_running_average=not self.train, axis=-1, momentum=0.9, epsilon=1e-5
        )

    def __call__(self, x):
        return self.bn(x)

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
        c = Conv1d(
            in_features=self.dim,
            features=self.dim,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            mode=self.mode,
        )
        return c.delay

    def setup(self):
        conv1 = Conv1d(
            in_features=self.dim,
            features=self.dim,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            mode=self.mode,
            weight_norm=self.weight_norm,
            use_bias=True,
            stream_batch=self.stream_batch,
        )
        conv2 = Conv1d(
            in_features=self.dim,
            features=self.dim,
            kernel_size=1,
            mode=self.mode,
            weight_norm=self.weight_norm,
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
    return Residual(
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
    stream_batch: int = 1

    def setup(self):
        dilations_list = normalize_dilations(self.dilations, self.ratios)
        layers = []
        conv0 = Conv1d(
            in_features=self.data_size * self.n_channels,
            features=self.capacity,
            kernel_size=2 * self.kernel_size + 1,
            mode=self.mode,
            weight_norm=self.weight_norm,
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
        self.net = Sequential(layers=tuple(layers))
        self.out_delay = final.delay

    @property
    def delay(self) -> int:
        return self.out_delay

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
    stream_batch: int = 1

    @property
    def delay(self) -> int:
        return 0

    def setup(self):
        chans = [self.in_size]
        chans += (len(self.ratios) - 1) * [self.hidden_size]
        chans.append(self.data_size * self.noise_bands * self.n_channels)
        layers = []
        for i, r in enumerate(self.ratios):
            layers.append(
                Conv1d(
                    in_features=chans[i],
                    features=chans[i + 1],
                    kernel_size=2 * r,
                    stride=r,
                    mode="causal",
                    stream_batch=self.stream_batch,
                )
            )
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

    def setup(self):
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
        self.net = Sequential(layers=tuple(layers))
        self.hidden_delay = delay
        self.hidden_ch = ch

        wave_out = (
            self.out_data_size * 2 if self.amplitude_modulation else self.out_data_size
        )
        waveform = Conv1d(
            in_features=ch,
            features=wave_out,
            kernel_size=self.kernel_size * 2 + 1,
            mode=self.mode,
            weight_norm=self.weight_norm,
            in_delay=delay,
            stream_batch=self.stream_batch,
        )
        if self.use_noise:
            noise = NoiseGeneratorV2(
                in_size=ch,
                hidden_size=self.noise_hidden,
                data_size=self.data_size or 1,
                ratios=self.noise_ratios,
                noise_bands=self.noise_bands,
                n_channels=self.n_channels,
                activation=self.activation,
                stream_batch=self.stream_batch,
            )
            # Align waveform and noise branches in streaming mode: the
            # (causal) noise branch leads the centered waveform conv.
            wave_d = waveform.delay - delay  # own contributions
            self.synth = AlignBranches(
                branches=(waveform, noise),
                delays=(wave_d, 0),
                features=(wave_out, self.out_data_size),
                stream_batch=self.stream_batch,
            )
            self.out_delay = delay + max(wave_d, 0)
        else:
            self.waveform = waveform
            self.out_delay = waveform.delay

    @property
    def delay(self) -> int:
        return self.out_delay

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
