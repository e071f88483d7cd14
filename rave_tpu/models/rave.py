"""The RAVE autoencoder: input transform -> encoder family -> decoder ->
output transform, with analysis buffers for export.

TPU-native re-design of the reference LightningModule's *architecture*
surface (rave/model.py:133-270). Training logic (losses, two-optimizer GAN
step, schedules) lives in rave_tpu/train — not in the module — so the same
module serves training, validation, export and streaming.

Layout: waveforms [B, T, C] (channels-last); latents [B, T_lat, D].
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rave_tpu.models.pqmf_module import PQMFAnalysis, PQMFSynthesis
from rave_tpu.nn.conv import guarded_variable, stream_variable
from rave_tpu.ops.pqmf import PQMFBank
from rave_tpu.ops.stft import frame_signal, hann_window, mel_filterbank, stft


class MelAnalysis(nn.Module):
    """Dual-mode log-mel front-end for the hybrid config.

    Offline matches torchaudio MelSpectrogram(center=True) with the
    reference's last-frame crop (rave/model.py:238-242). Streaming keeps a
    (n_fft - hop) sample overlap cache and runs causally; the stream lags
    the centered offline frames by (n_fft//2 - hop)/hop frames.
    """

    sampling_rate: int
    n_fft: int = 2048
    hop: int = 256
    n_mels: int = 128
    n_channels: int = 1
    stream_batch: int = 1

    @property
    def delay(self) -> int:
        assert (self.n_fft // 2) % self.hop == 0, (
            "streaming mel requires hop | n_fft/2"
        )
        return (self.n_fft // 2 - self.hop) // self.hop

    def setup(self):
        self.cache = stream_variable(
            self,
            "frame",
            (
                self.stream_batch * self.n_channels,
                self.n_fft - self.hop,
                1,
            ),
        )

    def _project(self, frames: jax.Array, B: int) -> jax.Array:
        win = jnp.asarray(hann_window(self.n_fft), frames.dtype)
        mag = jnp.abs(jnp.fft.rfft(frames * win, axis=-1))
        fb = jnp.asarray(
            mel_filterbank(self.sampling_rate, self.n_fft, self.n_mels),
            mag.dtype,
        )
        mel = jnp.log1p(jnp.einsum("btf,mf->btm", mag, fb))
        F = mel.shape[1]
        return (
            mel.reshape(B, self.n_channels, F, self.n_mels)
            .swapaxes(1, 2)
            .reshape(B, F, self.n_channels * self.n_mels)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        flat = x.swapaxes(1, 2).reshape(B * C, T)
        flat = jnp.pad(
            flat, [(0, 0), (self.n_fft // 2, self.n_fft // 2)], mode="reflect"
        )
        frames = frame_signal(flat, self.n_fft, self.hop)[:, :-1]
        return self._project(frames, B)

    def step(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        assert T % self.hop == 0
        flat = x.swapaxes(1, 2).reshape(B * C, T, 1)
        buf = self.cache.value
        ext = jnp.concatenate([buf.astype(flat.dtype), flat], axis=1)
        self.cache.value = ext[:, ext.shape[1] - buf.shape[1] :].astype(buf.dtype)
        frames = frame_signal(ext[..., 0], self.n_fft, self.hop)
        return self._project(frames, B)


class RAVE(nn.Module):
    """Autoencoder with pluggable latent family.

    Fields mirror the reference's gin-injected constructor
    (rave/model.py:136-224): `encoder` is a latent wrapper
    (Variational/Wasserstein/Discrete/Spherical), `decoder` a Generator.
    """

    encoder: Any
    decoder: Any
    pqmf: PQMFBank
    latent_size: int
    sampling_rate: int
    n_channels: int = 1
    input_mode: str = "pqmf"  # pqmf | mel | raw
    output_mode: str = "pqmf"  # pqmf | raw
    mel_n_fft: int = 2048
    mel_hop: int = 256
    n_mels: int = 128
    mode: str = "centered"
    stream_batch: int = 1
    # static streaming-delay metadata, computed by the factory on the
    # *unbound* encoder/decoder (flax forbids structural introspection of
    # bound children inside setup)
    encoder_delay: int = 0
    decoder_delay: int = 0

    def setup(self):
        self.pqmf_analysis = PQMFAnalysis(
            bank=self.pqmf,
            n_channels=self.n_channels,
            mode=self.mode,
            stream_batch=self.stream_batch,
        )
        if self.input_mode == "mel":
            self.mel_analysis = MelAnalysis(
                sampling_rate=self.sampling_rate,
                n_fft=self.mel_n_fft,
                hop=self.mel_hop,
                n_mels=self.n_mels,
                n_channels=self.n_channels,
                stream_batch=self.stream_batch,
            )
        # The decoder's output delay is in band-frame units when
        # output_mode == 'pqmf'.
        self.pqmf_synthesis = PQMFSynthesis(
            bank=self.pqmf,
            n_channels=self.n_channels,
            mode=self.mode,
            in_delay=self.decoder_delay if self.output_mode == "pqmf" else 0,
            stream_batch=self.stream_batch,
        )
        # Analysis buffers consumed by export & the latent prior
        # (reference rave/model.py:196-198, 463-488).
        D = self.latent_size
        self.latent_pca = guarded_variable(self, "buffers", "latent_pca", jnp.eye, D)
        self.latent_mean = guarded_variable(
            self, "buffers", "latent_mean", jnp.zeros, (D,)
        )
        self.fidelity = guarded_variable(self, "buffers", "fidelity", jnp.zeros, (D,))
        self.receptive_field = guarded_variable(
            self, "buffers", "receptive_field", jnp.zeros, (2,)
        )

    # ---- delays (streaming metadata, used by export manifest) -----------
    @property
    def encode_delay(self) -> int:
        """Latent-rate delay of streaming encode vs offline. The factory
        builds the encoder with in_delay = PQMF analysis delay, so the
        encoder delay is already cumulative."""
        return self.encoder_delay

    @property
    def decode_delay(self) -> int:
        """Waveform-rate delay of streaming decode vs offline."""
        if self.output_mode == "pqmf":
            Q = self.pqmf.taps
            pad_r = 0 if self.mode == "causal" or Q == 0 else Q // 2
            return (self.decoder_delay + pad_r) * max(self.pqmf.n_band, 1)
        return self.decoder_delay

    # ---- input / output transforms --------------------------------------
    def transform_input(self, x: jax.Array) -> jax.Array:
        if self.input_mode == "pqmf":
            return self.pqmf_analysis(x)
        if self.input_mode == "mel":
            return self.mel_analysis(x)
        return x

    def multiband(self, x: jax.Array) -> jax.Array:
        """PQMF analysis regardless of input mode (for multiband loss)."""
        return self.pqmf_analysis(x)

    # ---- public API (mirrors reference rave/model.py:244-270) -----------
    def encode(self, x: jax.Array, warmed_up: bool = False) -> jax.Array:
        return self.encoder(self.transform_input(x), warmed_up=warmed_up)

    def reparametrize(self, z: jax.Array, rng=None, **kw):
        return self.encoder.reparametrize(z, rng=rng, **kw)

    def _run_decoder(self, z: jax.Array, warmed_up: bool = True) -> jax.Array:
        # v1's noise branch is gated on the warmup phase
        # (reference rave/blocks.py:418-419); v2 ignores the flag.
        from rave_tpu.models.blocks import GeneratorV1

        if isinstance(self.decoder, GeneratorV1):
            return self.decoder(z, warmed_up=warmed_up)
        return self.decoder(z)

    def decode(self, z: jax.Array, warmed_up: bool = True) -> jax.Array:
        y = self._run_decoder(z, warmed_up)
        if self.output_mode == "pqmf":
            y = self.pqmf_synthesis(y)
        return y

    def decode_multiband(self, z: jax.Array, warmed_up: bool = True) -> jax.Array:
        """Decoder output in band-frame space (pre-synthesis)."""
        return self._run_decoder(z, warmed_up)

    def synthesize(self, y_mb: jax.Array) -> jax.Array:
        return self.pqmf_synthesis(y_mb) if self.output_mode == "pqmf" else y_mb

    def __call__(self, x: jax.Array) -> jax.Array:
        z = self.encode(x)
        zs, _ = self.reparametrize(z)
        return self.decode(zs)

    # ---- streaming path --------------------------------------------------
    def step_encode(self, x: jax.Array) -> jax.Array:
        if self.input_mode == "pqmf":
            h = self.pqmf_analysis.step(x)
        elif self.input_mode == "mel":
            h = self.mel_analysis.step(x)
        else:
            h = x
        return self.encoder.step(h)

    def step_decode(self, z: jax.Array) -> jax.Array:
        y = self.decoder.step(z)
        if self.output_mode == "pqmf":
            y = self.pqmf_synthesis.step(y)
        return y
