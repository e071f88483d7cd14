"""Composable configuration system (the gin equivalent).

The reference composes `.gin` files by `include` + CLI stacking
(`--config v2 --config causal --override KEY=value`, SURVEY.md §5). Here a
config is a nested dataclass tree; presets are functions that mutate it and
compose in CLI order; overrides are dotted-path assignments. The resolved
config is snapshotted to JSON next to checkpoints and its md5 joins the run
name (reference scripts/train.py:153-156, 201-204, 265-266).
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple


@dataclass
class EncoderConfig:
    kind: str = "v2"  # v1 | v2
    capacity: Optional[int] = None  # None -> cfg.capacity
    ratios: Optional[Tuple[int, ...]] = None  # None -> cfg.ratios
    data_size: Optional[int] = None  # None -> n_band (pqmf) / n_mels (mel) / 1
    dilations: Optional[Tuple] = None
    kernel_size: Optional[int] = None
    keep_dim: bool = False
    sample_norm: bool = False
    repeat_layers: int = 1
    recurrent_layers: int = 0
    use_adain: bool = False


@dataclass
class LatentConfig:
    family: str = "variational"  # variational|wasserstein|discrete|spherical
    noise_augmentation: int = 0
    # discrete
    num_quantizers: int = 16
    codebook_size: int = 1024


@dataclass
class DecoderConfig:
    kind: str = "v2"  # v1 | v2
    capacity: Optional[int] = None
    ratios: Optional[Tuple[int, ...]] = None
    keep_dim: bool = False
    amplitude_modulation: bool = True
    use_noise: bool = False  # v2 NoiseGeneratorV2 branch
    noise_hidden: int = 64
    noise_ratios: Tuple[int, ...] = (2, 2, 2)
    noise_bands: int = 5
    recurrent_layers: int = 0
    use_adain: bool = False
    # v1 specifics
    loud_stride: int = 1
    use_noise_v1: bool = True
    v1_noise_ratios: Tuple[int, ...] = (4, 4, 4)
    v1_noise_bands: int = 5
    res_kernel_sizes: Tuple[int, ...] = (3,)
    res_dilations: Tuple[Tuple[int, ...], ...] = ((1, 1), (3, 1), (5, 1))


@dataclass
class DiscriminatorConfig:
    kind: str = "multiscale"  # multiscale|combined|spectral|descript
    capacity: Optional[int] = None
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4
    n_scales: int = 3
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    period_kernel: Tuple[int, int] = (5, 1)
    spectral_scales: Tuple[int, ...] = (4096, 2048, 1024, 512, 256)
    encodec_capacity: int = 32
    # descript
    descript_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    descript_fft_sizes: Tuple[int, ...] = (2048, 1024, 512)


@dataclass
class DistanceConfig:
    kind: str = "v1"  # v1 (AudioDistanceV1) | encodec | instantaneous
    scales: Tuple[int, ...] = (2048, 1024, 512, 256, 128)
    log_epsilon: float = 1e-7
    num_mels: Optional[int] = None


@dataclass
class TrainConfig:
    phase_1_duration: int = 1_000_000
    warmup_quantize: Optional[int] = None
    update_discriminator_every: int = 2
    gan_loss: str = "hinge"  # hinge | ls | nonsaturating
    valid_signal_crop: bool = False
    num_skipped_features: int = 0
    feature_matching_relative: bool = False
    weights: Dict[str, float] = field(
        default_factory=lambda: {
            "audio_distance": 1.0,
            "multiband_audio_distance": 1.0,
            "adversarial": 1.0,
            "feature_matching": 10.0,
        }
    )
    beta_initial: float = 0.1
    beta_target: float = 0.1
    beta_warmup_len: int = 1
    beta_log_warmup: bool = True
    gen_lr: float = 1e-3
    dis_lr: float = 1e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    lr_end_factor: float = 0.1  # LinearLR 1.0 -> 0.1 over phase 1
    max_steps: int = 6_000_000
    ema: Optional[float] = None
    remat: bool = False  # rematerialize the autoencoder in the bwd pass
    bf16: bool = False  # bf16 model compute, fp32 master weights + losses
    # bf16 discriminator compute (adversarial phase). The critic stack
    # dominates warmed-up step time; features are upcast to fp32 at the
    # loss boundary and weight grads land fp32 via the per-op cast's vjp.
    bf16_dis: bool = False
    # Also compute the generator-side spectral distances on discriminator
    # steps (4 multiscale-STFT stacks that only feed logging there — the
    # critic loss never reads them). Off by default for throughput; the
    # reference's combined training_step computes them every step
    # (rave/model.py:334-344), flip on for log-for-log parity.
    dis_full_metrics: bool = False


@dataclass
class DataConfig:
    sampling_rate: int = 44100
    n_signal: int = 131072
    batch: int = 8
    augmentations: Tuple[str, ...] = ()
    n_channels: int = 1  # resolved at train time from dataset metadata
    derivative: bool = False
    normalize: bool = False
    rand_pitch: Optional[float] = None
    workers: int = 8


@dataclass
class RaveConfig:
    name: str = "v2"
    sampling_rate: int = 44100
    capacity: int = 96
    n_band: int = 16
    pqmf_attenuation: int = 100
    latent_size: int = 128
    ratios: Tuple[int, ...] = (4, 4, 4, 2)
    kernel_size: int = 3
    dilations: Tuple = ((1, 3, 9), (1, 3, 9), (1, 3, 9), (1, 3))
    mode: str = "centered"  # causal preset flips to 'causal'
    activation: str = "leaky_relu"  # snake preset flips
    weight_norm: bool = True
    input_mode: str = "pqmf"  # pqmf | mel | raw
    output_mode: str = "pqmf"  # pqmf | raw
    mel_n_fft: int = 2048
    mel_hop: int = 256
    n_mels: int = 128
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    latent: LatentConfig = field(default_factory=LatentConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    distance: DistanceConfig = field(default_factory=DistanceConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)

    # ---- resolved accessors ---------------------------------------------
    def enc_capacity(self) -> int:
        return self.encoder.capacity or self.capacity

    def dec_capacity(self) -> int:
        return self.decoder.capacity or self.capacity

    def enc_ratios(self) -> Tuple[int, ...]:
        return tuple(self.encoder.ratios or self.ratios)

    def dec_ratios(self) -> Tuple[int, ...]:
        return tuple(self.decoder.ratios or self.ratios)

    def enc_data_size(self) -> int:
        if self.encoder.data_size is not None:
            return self.encoder.data_size
        if self.input_mode == "pqmf":
            return self.n_band
        if self.input_mode == "mel":
            return self.n_mels
        return 1

    def dec_data_size(self) -> int:
        return self.n_band if self.output_mode == "pqmf" else 1

    def num_latent_out(self) -> int:
        return 2 if self.latent.family == "variational" else 1

    def augmented_latent_size(self) -> int:
        if self.latent.family in ("wasserstein", "discrete"):
            return self.latent_size + self.latent.noise_augmentation
        return self.latent_size

    def decimation(self) -> int:
        """Total waveform -> latent decimation."""
        dec = 1
        for r in self.enc_ratios():
            dec *= r
        if self.input_mode == "pqmf":
            dec *= self.n_band
        elif self.input_mode == "mel":
            dec *= self.mel_hop
        return dec

    def block_size(self) -> int:
        """Minimum streaming block in waveform samples: lcm of the encoder
        decimation, decoder upsampling, the PQMF 2-frame parity, and the
        decoder's internal strided branches (noise synth / loud stride).

        Strided streaming convs drop input that is not a whole multiple of
        their stride (nn/conv.py Conv1d.step), so the block must hand every
        strided branch a whole number of its frames. The noise nets run at
        the decoder's wave-frame rate (n_band samples per frame under pqmf
        output) and downsample by prod(ratios); loud_gen strides by
        loud_stride at the same rate."""
        import math

        dec = self.decimation()
        up = 1
        for r in self.dec_ratios():
            up *= r
        band = self.n_band if self.output_mode == "pqmf" else 1
        b = math.lcm(dec, up * band)
        if self.input_mode == "pqmf" or self.output_mode == "pqmf":
            b = math.lcm(b, 2 * self.n_band)
        if self.decoder.kind == "v1":
            if self.decoder.use_noise_v1:
                b = math.lcm(b, band * math.prod(self.decoder.v1_noise_ratios))
            if self.decoder.loud_stride > 1:
                b = math.lcm(b, band * self.decoder.loud_stride)
        elif self.decoder.kind == "v2" and self.decoder.use_noise:
            b = math.lcm(b, band * math.prod(self.decoder.noise_ratios))
        return b


# --------------------------------------------------------------------------
# preset registry (the configs/*.gin equivalents)
# --------------------------------------------------------------------------

PRESETS: Dict[str, Callable[[RaveConfig], None]] = {}


def preset(name: str):
    def deco(fn):
        PRESETS[name] = fn
        return fn

    return deco


@preset("v1")
def _v1(c: RaveConfig):
    """rave/configs/v1.gin"""
    c.name = "v1"
    c.capacity = 64
    c.n_band = 16
    c.latent_size = 128
    c.ratios = (4, 4, 4, 2)
    c.encoder.kind = "v1"
    c.decoder.kind = "v1"
    c.latent.family = "variational"
    c.discriminator = DiscriminatorConfig(kind="multiscale", capacity=64)
    c.train.phase_1_duration = 1_000_000
    c.train.update_discriminator_every = 2
    c.train.valid_signal_crop = False
    c.train.num_skipped_features = 0
    c.train.feature_matching_relative = False
    c.train.weights["feature_matching"] = 10.0
    c.train.beta_initial = c.train.beta_target = 0.1
    c.train.beta_warmup_len = 1


@preset("v2")
def _v2(c: RaveConfig):
    """rave/configs/v2.gin (includes v1)"""
    _v1(c)
    c.name = "v2"
    c.capacity = 96
    c.kernel_size = 3
    c.dilations = ((1, 3, 9), (1, 3, 9), (1, 3, 9), (1, 3))
    c.ratios = (4, 4, 4, 2)
    c.encoder.kind = "v2"
    c.decoder.kind = "v2"
    c.decoder.amplitude_modulation = True
    c.discriminator = DiscriminatorConfig(kind="combined", capacity=96)
    c.train.valid_signal_crop = True
    c.train.num_skipped_features = 1
    c.train.update_discriminator_every = 4
    c.train.feature_matching_relative = True
    c.train.weights["feature_matching"] = 20.0
    c.train.beta_initial = 1e-6
    c.train.beta_target = 5e-2
    c.train.beta_warmup_len = 20000


@preset("v2_small")
def _v2_small(c: RaveConfig):
    """rave/configs/v2_small.gin"""
    _v2(c)
    c.name = "v2_small"
    c.capacity = 48
    c.ratios = (4, 2, 2, 2)
    c.discriminator.capacity = 48
    c.decoder.use_noise = True
    c.decoder.noise_hidden = 64
    c.decoder.noise_ratios = (2, 2, 2)
    c.decoder.noise_bands = 32
    c.train.update_discriminator_every = 2
    c.train.beta_initial = c.train.beta_target = 0.01
    c.train.beta_warmup_len = 300_000


@preset("v2_nopqmf")
def _v2_nopqmf(c: RaveConfig):
    """rave/configs/v2_nopqmf.gin — decoder synthesizes raw waveform."""
    _v2(c)
    c.name = "v2_nopqmf"
    c.capacity = 64
    c.encoder.ratios = (4, 4, 4, 2)
    c.decoder.ratios = (8, 8, 8, 4)
    c.discriminator.capacity = 64
    c.output_mode = "raw"
    c.train.beta_initial = 1e-6
    c.train.beta_target = 1e-2
    c.train.beta_warmup_len = 500_000
    # v2_nopqmf.gin:34-42 binds RandomCompress with explicit params
    c.data.augmentations = (
        '{"type":"RandomCompress","threshold":-40,"amp_range":[-60,-10],"prob":0.5}',
    )


@preset("v2_nopqmf_small")
def _v2_nopqmf_small(c: RaveConfig):
    """rave/configs/v2_nopqmf_small.gin — v1 base + V2 blocks at capacity
    64, raw-waveform decoder ratios [8,8,8,4] with PQMF kept on the encoder
    side only (retro flags enable_pqmf_encode=True / enable_pqmf_decode=
    False, v2_nopqmf_small.gin:100-104), phase 1 = 500k, static reg weight
    0.02, compress augmentation baked in (lines 34-42)."""
    _v1(c)
    c.name = "v2_nopqmf_small"
    c.capacity = 64
    c.kernel_size = 3
    c.dilations = ((1, 3, 9), (1, 3, 9), (1, 3, 9), (1, 3))
    c.encoder.kind = "v2"
    c.decoder.kind = "v2"
    c.encoder.ratios = (4, 4, 4, 2)
    c.decoder.ratios = (8, 8, 8, 4)
    c.decoder.amplitude_modulation = True
    c.discriminator = DiscriminatorConfig(kind="combined", capacity=64)
    c.output_mode = "raw"
    c.train.valid_signal_crop = True
    c.train.num_skipped_features = 1
    c.train.update_discriminator_every = 4
    c.train.feature_matching_relative = True
    c.train.weights["feature_matching"] = 20.0
    c.train.phase_1_duration = 500_000
    c.train.beta_initial = c.train.beta_target = 0.02
    c.train.beta_warmup_len = 1
    # the gin binds its compress params under the (mistyped) static
    # Compress scope; the operative intent is the RandomCompress of
    # v2_nopqmf.gin with the same values
    c.data.augmentations = (
        '{"type":"RandomCompress","threshold":-40,"amp_range":[-60,-10],"prob":0.5}',
    )


@preset("v2_with_augs")
def _v2_with_augs(c: RaveConfig):
    """rave/configs/v2_with_augs.gin — mel-spectrogram input v2 (N_FFT
    2048, 128 mels, hop 256, encoder ratios [2,2,2], PQMF decoder ratios
    [4,4,4,2]) with RandomCompress baked in (lines 27-47)."""
    _v2(c)
    c.name = "v2_with_augs"
    c.input_mode = "mel"
    c.mel_n_fft = 2048
    c.mel_hop = 256
    c.n_mels = 128
    c.encoder.ratios = (2, 2, 2)
    c.train.phase_1_duration = 1_000_000
    # v2_with_augs.gin includes configs/v1.gin (line 14), NOT v2.gin — so it
    # inherits v1's loss weights and fixed beta, not v2's warmup.
    c.train.weights["feature_matching"] = 10.0
    c.train.beta_initial = c.train.beta_target = 0.1
    c.train.beta_warmup_len = 1
    c.data.augmentations = (
        '{"type":"RandomCompress","threshold":-40,"amp_range":[-60,-10],"prob":0.5}',
    )


@preset("normalize_ambient")
def _normalize_ambient(c: RaveConfig):
    """rave/configs/normalize_ambient.gin — composable preset that adds a
    static sox-compand ambient normalizer to the augmentation pipeline
    (time 0.01,0.01, 6 dB knee, curve -30/-15 -10/-8 0/-5)."""
    c.data.augmentations = tuple(c.data.augmentations) + (
        '{"type":"Compress","time":"0.01,0.01","lookup":"6:-30,-15,-10,-8,0,-5"}',
    )


@preset("v3")
def _v3(c: RaveConfig):
    """rave/configs/v3.gin = v2 + adain + snake + descript."""
    _v2(c)
    c.name = "v3"
    _snake(c)
    _adain(c)
    _descript(c)
    c.train.beta_initial = 1e-6
    c.train.beta_target = 5e-2
    c.train.beta_warmup_len = 20000


@preset("discrete")
def _discrete(c: RaveConfig):
    """rave/configs/discrete.gin"""
    _v2(c)
    c.name = "discrete"
    c.ratios = (4, 4, 2, 2)
    c.latent_size = 128
    c.capacity = 96
    c.latent.family = "discrete"
    c.latent.num_quantizers = 16
    c.latent.codebook_size = 1024
    c.latent.noise_augmentation = 128
    c.distance.log_epsilon = 1.0
    c.train.phase_1_duration = 200_000
    c.train.warmup_quantize = -1
    c.train.num_skipped_features = 0
    c.train.update_discriminator_every = 4
    c.train.beta_initial = c.train.beta_target = 0.1
    c.train.beta_warmup_len = 1


@preset("discrete_v3")
def _discrete_v3(c: RaveConfig):
    _discrete(c)
    c.name = "discrete_v3"
    _snake(c)
    _descript(c)
    # discrete_v3.gin re-overrides BetaWarmupCallback after its includes
    # (reference configs/discrete_v3.gin:9-12), undoing discrete's fixed beta.
    c.train.beta_initial = 1e-6
    c.train.beta_target = 5e-2
    c.train.beta_warmup_len = 20000


@preset("wasserstein")
def _wasserstein(c: RaveConfig):
    """rave/configs/wasserstein.gin (applied on top of v2)."""
    c.name = "wasserstein"
    c.latent_size = 16
    c.latent.family = "wasserstein"
    c.latent.noise_augmentation = 128
    c.train.phase_1_duration = 200_000
    c.train.weights.update(
        {
            "fullband_spectral_distance": 2.0,
            "multiband_spectral_distance": 2.0,
            "adversarial": 2.0,
        }
    )
    c.train.beta_initial = c.train.beta_target = 100.0
    c.train.beta_warmup_len = 1


@preset("spherical")
def _spherical(c: RaveConfig):
    """rave/configs/spherical.gin (applied on top of v2)."""
    c.name = "spherical"
    c.latent_size = 16
    c.latent.family = "spherical"
    c.train.phase_1_duration = 200_000


@preset("hybrid")
def _hybrid(c: RaveConfig):
    """rave/configs/hybrid.gin — mel input, GRU decoder."""
    _v2(c)
    c.name = "hybrid"
    c.input_mode = "mel"
    c.mel_n_fft = 2048
    c.mel_hop = 256
    c.n_mels = 128
    c.encoder.ratios = (2, 2, 2)
    c.encoder.dilations = (1,)
    c.decoder.recurrent_layers = 2


@preset("onnx")
def _onnx(c: RaveConfig):
    """rave/configs/onnx.gin — small v1 without noise."""
    _v1(c)
    c.name = "onnx"
    c.capacity = 32
    c.discriminator.capacity = 32
    c.decoder.use_noise_v1 = False


@preset("raspberry")
def _raspberry(c: RaveConfig):
    _onnx(c)
    c.name = "raspberry"
    c.capacity = 16
    c.discriminator.capacity = 16


@preset("causal")
def _causal(c: RaveConfig):
    """rave/configs/causal.gin — zero-lookahead convs everywhere."""
    c.mode = "causal"
    c.name = c.name + "_causal"


@preset("snake")
def _snake(c: RaveConfig):
    c.activation = "snake"


@preset("adain")
def _adain(c: RaveConfig):
    c.encoder.use_adain = True
    c.decoder.use_adain = True


@preset("noise")
def _noise(c: RaveConfig):
    """rave/configs/noise.gin — enable NoiseGeneratorV2 in GeneratorV2."""
    c.decoder.use_noise = True
    c.decoder.noise_hidden = 128
    c.decoder.noise_ratios = (2, 2, 2)
    c.decoder.noise_bands = 5


@preset("spectral_discriminator")
def _spectral_disc(c: RaveConfig):
    c.discriminator.kind = "spectral"
    c.discriminator.encodec_capacity = 32


@preset("descript_discriminator")
def _descript(c: RaveConfig):
    c.discriminator.kind = "descript"


# --------------------------------------------------------------------------
# composition / overrides / snapshot
# --------------------------------------------------------------------------


def compose(names: List[str], overrides: Optional[List[str]] = None) -> RaveConfig:
    """Build a config from stacked preset names + dotted overrides. A name
    that is a path to an existing `.gin` file is ingested through the
    reference-gin parser (config_gin) instead — reference users can pass
    their run's config.gin or custom gins directly."""
    import os

    cfg = RaveConfig()
    for n in names:
        if str(n).endswith(".gin") and os.path.isfile(n):
            from rave_tpu.config_gin import apply_gin_file

            apply_gin_file(cfg, str(n))
            continue
        key = n.replace(".gin", "")
        if key not in PRESETS:
            raise KeyError(f"unknown config preset '{key}'; have {sorted(PRESETS)}")
        PRESETS[key](cfg)
    for ov in overrides or []:
        apply_override(cfg, ov)
    up = 1
    for r in cfg.dec_ratios():
        up *= r
    if cfg.output_mode == "pqmf":
        up *= cfg.n_band
    if up != cfg.decimation():
        # an autoencoder must be rate-preserving; catching it here beats a
        # shape error (or silent drift) deep inside export/streaming
        raise ValueError(
            f"config is not rate-preserving: encoder decimation "
            f"{cfg.decimation()} != decoder upsampling {up} — check "
            f"ratios/encoder.ratios/mel_hop/n_band"
        )
    return cfg


def _parse_value(s: str) -> Any:
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def apply_override(cfg: RaveConfig, assignment: str) -> None:
    """'train.beta_target=0.2' / 'ratios=[4,4,2,2]' style override."""
    path, _, raw = assignment.partition("=")
    obj = cfg
    parts = path.strip().split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    val = _parse_value(raw.strip())
    if isinstance(val, list):
        val = tuple(tuple(v) if isinstance(v, list) else v for v in val)
    cur = getattr(obj, parts[-1])
    if isinstance(cur, dict) and isinstance(val, dict):
        cur.update(val)
    else:
        setattr(obj, parts[-1], val)


def to_dict(cfg: RaveConfig) -> dict:
    return dataclasses.asdict(cfg)


def snapshot(cfg: RaveConfig) -> str:
    """Canonical JSON snapshot (written next to checkpoints)."""
    return json.dumps(to_dict(cfg), indent=2, sort_keys=True, default=str)


def config_hash(cfg: RaveConfig) -> str:
    return hashlib.md5(snapshot(cfg).encode()).hexdigest()[:10]


def from_dict(d: dict) -> RaveConfig:
    """Inverse of to_dict (for reloading config.json from a run dir)."""

    def build(cls, dd):
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name not in dd:
                continue
            v = dd[f.name]
            if dataclasses.is_dataclass(f.type) or f.name in (
                "encoder", "latent", "decoder", "discriminator",
                "distance", "train", "data",
            ):
                sub = {
                    "encoder": EncoderConfig,
                    "latent": LatentConfig,
                    "decoder": DecoderConfig,
                    "discriminator": DiscriminatorConfig,
                    "distance": DistanceConfig,
                    "train": TrainConfig,
                    "data": DataConfig,
                }[f.name]
                kw[f.name] = build(sub, v)
            elif isinstance(v, list):
                kw[f.name] = tuple(
                    tuple(x) if isinstance(x, list) else x for x in v
                )
            else:
                kw[f.name] = v
        return cls(**kw)

    return build(RaveConfig, d)
