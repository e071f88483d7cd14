"""Model factory: RaveConfig -> flax modules + loss functions.

The equivalent of gin's dependency injection (SURVEY.md §2.8): every
architectural choice in RaveConfig maps onto module fields here.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any, Tuple

from rave_tpu.config import RaveConfig
from rave_tpu.models import blocks
from rave_tpu.models.descript import DescriptDiscriminator
from rave_tpu.models.discriminators import (
    CombineDiscriminators,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    MultiScaleSpectralDiscriminator,
)
from rave_tpu.models.pqmf_module import PQMFAnalysis
from rave_tpu.models.rave import RAVE
from rave_tpu.ops.distances import AudioDistanceV1
from rave_tpu.ops.dsp import GAN_LOSSES
from rave_tpu.ops.pqmf import PQMFBank
from rave_tpu.ops.stft import MultiScaleSTFT


@lru_cache(maxsize=8)
def get_pqmf_bank(attenuation: int, n_band: int) -> PQMFBank:
    return PQMFBank.build(attenuation, n_band)


def pqmf_analysis_delay(cfg: RaveConfig) -> int:
    """Streaming delay (input frames) of the encoder's front-end."""
    if cfg.input_mode == "mel":
        return (cfg.mel_n_fft // 2 - cfg.mel_hop) // cfg.mel_hop
    if cfg.input_mode != "pqmf" or cfg.n_band == 1:
        return 0
    bank = get_pqmf_bank(cfg.pqmf_attenuation, cfg.n_band)
    pa = PQMFAnalysis(bank=bank, mode=cfg.mode)
    return pa.delay


def build_encoder(
    cfg: RaveConfig, n_channels: int, train: bool, stream_batch: int
):
    n_out = cfg.num_latent_out()
    in_delay = pqmf_analysis_delay(cfg)
    kw = dict(
        data_size=cfg.enc_data_size(),
        capacity=cfg.enc_capacity(),
        latent_size=cfg.latent_size,
        ratios=cfg.enc_ratios(),
        n_out=n_out,
        n_channels=n_channels,
        mode=cfg.mode,
        train=train,
        in_delay=in_delay,
        stream_batch=stream_batch,
    )
    if cfg.encoder.kind == "v2":
        inner = blocks.EncoderV2(
            kernel_size=cfg.encoder.kernel_size or cfg.kernel_size,
            dilations=tuple(cfg.encoder.dilations or cfg.dilations),
            keep_dim=cfg.encoder.keep_dim,
            weight_norm=cfg.weight_norm,
            activation=cfg.activation,
            use_adain=cfg.encoder.use_adain,
            recurrent_layers=cfg.encoder.recurrent_layers,
            **kw,
        )
    elif cfg.encoder.kind == "v1":
        inner = blocks.EncoderV1(
            sample_norm=cfg.encoder.sample_norm,
            repeat_layers=cfg.encoder.repeat_layers,
            recurrent_layers=cfg.encoder.recurrent_layers,
            **kw,
        )
    else:
        raise ValueError(f"unknown encoder kind {cfg.encoder.kind}")

    fam = cfg.latent.family
    if fam == "variational":
        return blocks.VariationalEncoder(encoder=inner)
    if fam == "wasserstein":
        return blocks.WassersteinEncoder(
            encoder=inner, noise_augmentation=cfg.latent.noise_augmentation
        )
    if fam == "discrete":
        return blocks.DiscreteEncoder(
            encoder=inner,
            num_quantizers=cfg.latent.num_quantizers,
            codebook_size=cfg.latent.codebook_size,
            latent_size=cfg.latent_size,
            noise_augmentation=cfg.latent.noise_augmentation,
        )
    if fam == "spherical":
        return blocks.SphericalEncoder(encoder=inner)
    raise ValueError(f"unknown latent family {fam}")


def build_decoder(
    cfg: RaveConfig, n_channels: int, train: bool, stream_batch: int
):
    latent = cfg.augmented_latent_size()
    if cfg.decoder.kind == "v2":
        return blocks.GeneratorV2(
            latent_size=latent,
            capacity=cfg.dec_capacity(),
            ratios=cfg.dec_ratios(),
            kernel_size=cfg.kernel_size,
            dilations=tuple(cfg.dilations),
            data_size=cfg.dec_data_size(),
            keep_dim=cfg.decoder.keep_dim,
            n_channels=n_channels,
            amplitude_modulation=cfg.decoder.amplitude_modulation,
            use_noise=cfg.decoder.use_noise,
            noise_hidden=cfg.decoder.noise_hidden,
            noise_ratios=cfg.decoder.noise_ratios,
            noise_bands=cfg.decoder.noise_bands,
            mode=cfg.mode,
            weight_norm=cfg.weight_norm,
            activation=cfg.activation,
            use_adain=cfg.decoder.use_adain,
            recurrent_layers=cfg.decoder.recurrent_layers,
            train=train,
            stream_batch=stream_batch,
        )
    if cfg.decoder.kind == "v1":
        return blocks.GeneratorV1(
            latent_size=latent,
            capacity=cfg.dec_capacity(),
            data_size=cfg.dec_data_size(),
            ratios=cfg.dec_ratios(),
            loud_stride=cfg.decoder.loud_stride,
            use_noise=cfg.decoder.use_noise_v1,
            noise_ratios=cfg.decoder.v1_noise_ratios,
            noise_bands=cfg.decoder.v1_noise_bands,
            res_kernel_sizes=cfg.decoder.res_kernel_sizes,
            res_dilations=cfg.decoder.res_dilations,
            n_channels=n_channels,
            recurrent_layers=cfg.decoder.recurrent_layers,
            mode=cfg.mode,
            weight_norm=cfg.weight_norm,
            activation=cfg.activation,
            stream_batch=stream_batch,
        )
    raise ValueError(f"unknown decoder kind {cfg.decoder.kind}")


def build_rave(
    cfg: RaveConfig,
    n_channels: int = 1,
    train: bool = False,
    stream_batch: int = 1,
) -> RAVE:
    encoder = build_encoder(cfg, n_channels, train, stream_batch)
    decoder = build_decoder(cfg, n_channels, train, stream_batch)
    return RAVE(
        encoder=encoder,
        decoder=decoder,
        encoder_delay=encoder.delay,
        decoder_delay=decoder.delay,
        pqmf=get_pqmf_bank(cfg.pqmf_attenuation, cfg.n_band),
        latent_size=cfg.latent_size,
        sampling_rate=cfg.sampling_rate,
        n_channels=n_channels,
        input_mode=cfg.input_mode,
        output_mode=cfg.output_mode,
        mel_n_fft=cfg.mel_n_fft,
        mel_hop=cfg.mel_hop,
        n_mels=cfg.n_mels,
        mode=cfg.mode,
        stream_batch=stream_batch,
    )


def build_discriminator(cfg: RaveConfig, n_channels: int = 1):
    d = cfg.discriminator
    cap = d.capacity or cfg.capacity
    if d.kind == "multiscale":
        return MultiScaleDiscriminator(
            n_discriminators=d.n_scales,
            capacity=cap,
            n_layers=d.n_layers,
            kernel_size=d.kernel_size,
            stride=d.stride,
        )
    if d.kind == "combined":
        return CombineDiscriminators(
            discriminators=(
                MultiPeriodDiscriminator(
                    periods=d.periods,
                    capacity=cap,
                    n_layers=d.n_layers,
                    kernel_size=d.period_kernel,
                    stride=d.stride,
                ),
                MultiScaleDiscriminator(
                    n_discriminators=d.n_scales,
                    capacity=cap,
                    n_layers=d.n_layers,
                    kernel_size=d.kernel_size,
                    stride=d.stride,
                ),
            )
        )
    if d.kind == "spectral":
        return CombineDiscriminators(
            discriminators=(
                MultiScaleDiscriminator(
                    n_discriminators=d.n_scales,
                    capacity=cap,
                    n_layers=d.n_layers,
                    kernel_size=d.kernel_size,
                    stride=d.stride,
                ),
                MultiScaleSpectralDiscriminator(
                    scales=d.spectral_scales, capacity=d.encodec_capacity
                ),
            )
        )
    if d.kind == "descript":
        return DescriptDiscriminator(
            periods=d.descript_periods,
            fft_sizes=d.descript_fft_sizes,
            # packed fmaps skip per-layer unpack copies in the MRD; exactly
            # loss-preserving only for the relative (sum/sum) feature
            # matching distance (models/descript.py MRD.packed_fmaps)
            packed_fmaps=cfg.train.feature_matching_relative,
        )
    raise ValueError(f"unknown discriminator kind {d.kind}")


def build_audio_distance(cfg: RaveConfig):
    kind = cfg.distance.kind
    if kind == "v1":
        return AudioDistanceV1(
            multiscale_stft=MultiScaleSTFT(
                scales=tuple(cfg.distance.scales),
                sample_rate=cfg.sampling_rate,
                magnitude=True,
                num_mels=cfg.distance.num_mels,
            ),
            log_epsilon=cfg.distance.log_epsilon,
        )
    if kind == "instantaneous":
        from rave_tpu.ops.distances import WeightedInstantaneousSpectralDistance

        return WeightedInstantaneousSpectralDistance(
            multiscale_stft=MultiScaleSTFT(
                scales=tuple(cfg.distance.scales),
                sample_rate=cfg.sampling_rate,
                magnitude=False,
            ),
            weighted=True,
        )
    if kind == "encodec":
        from rave_tpu.ops.distances import EncodecAudioDistance

        return EncodecAudioDistance(
            scales=tuple(cfg.distance.scales),
            sampling_rate=cfg.sampling_rate,
        )
    raise ValueError(f"unknown distance kind {kind}")


def build_gan_loss(cfg: RaveConfig):
    return GAN_LOSSES[cfg.train.gan_loss]
