"""True ONNX emission of the RAVE forward pass (v1 family).

Role parity with reference scripts/export_onnx.py:76-91: a pretrained
run exports to `<name>.onnx` — opset 12, dynamic audio length, weights
baked as initializers, input "audio_in" [1, n_channels, audio_length],
output "audio_out" — consumable by onnxruntime (not shipped here; the
in-repo interpreter rave_tpu/export/onnx_run.py evaluates the same ops
and the export test pins numerical agreement with the live jax model).

Scope mirrors the reference's: the exportable configuration is the v1
family without the noise branch (reference configs/onnx.gin sets
`blocks.Generator.use_noise = False` precisely because the FFT-based
noise synth has no opset-12 lowering; the same constraint applies here).
Unsupported families raise with a pointer to the .rtpu/StableHLO path
(export/portable.py), which covers every family.

The emitted graph mirrors the *offline centered* forward
(models/rave.py:216-219): PQMF analysis -> EncoderV1 -> variational
reparametrization -> GeneratorV1 -> PQMF synthesis. Sampling uses
RandomNormalLike like the traced reference graph; `deterministic=True`
replaces it with the posterior mean.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from rave_tpu.config import RaveConfig
from rave_tpu.export.onnx_graph import Builder
from rave_tpu.nn.conv import get_padding


def _np(tree):
    return np.asarray(tree, np.float32)


def _wn(p: Dict[str, Any]) -> np.ndarray:
    """Materialize weight-norm params to an effective [K, I, O] kernel
    (nn/conv.py:70-73)."""
    if "w" in p:
        return _np(p["w"])
    v, g = _np(p["v"]), _np(p["g"])
    norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
    return v * (g / norm)


def _reverse_half(b: Builder, z: str, n_band: int) -> str:
    """Dynamic-length reverse_half (ops/pqmf.py:73-86): odd bands flip sign
    at even frames. mask[k, n] = 1 + band_odd[k] * ((2*(n%2)-1) - 1)."""
    shape = b.op("Shape", [z])
    f = b.op(
        "Gather", [shape, b.const("idx", np.asarray(2, np.int64))], axis=0
    )
    rng = b.op(
        "Range",
        [b.const("start", np.asarray(0, np.int64)), f,
         b.const("delta", np.asarray(1, np.int64))],
    )
    parity = b.op("Mod", [rng, b.const("two", np.asarray(2, np.int64))])
    parity_f = b.op("Cast", [parity], to=1)  # float32
    # e[n] = 2*(n%2) - 2  (== -2 at even frames, 0 at odd)
    e = b.add_const(b.mul_const(parity_f, np.asarray(2.0, np.float32)),
                    np.asarray(-2.0, np.float32))
    e = b.op("Unsqueeze", [e], axes=[0, 1])  # [1, 1, F]
    band_odd = (np.arange(n_band) % 2).astype(np.float32).reshape(1, n_band, 1)
    mask = b.add_const(
        b.mul(e, b.const("band_odd", band_odd)), np.asarray(1.0, np.float32)
    )
    return b.mul(z, mask)


def _encoder_v1(b: Builder, x: str, cfg: RaveConfig, params, stats) -> str:
    """EncoderV1 offline forward (models/blocks.py:1019-1091). The param
    scope is encoder/encoder/net (VariationalEncoder wraps EncoderV1)."""
    net_p = params["encoder"]["encoder"]["net"]
    net_s = stats["encoder"]["encoder"]["net"]
    i = 0

    def conv(x, idx, k, stride=1, groups=1):
        pr = get_padding(k, stride, 1, cfg.mode)
        return b.conv1d(
            x, _wn(net_p[f"layers_{idx}"]), None,
            stride=stride, pads=pr if isinstance(pr, tuple) else pr,
            groups=groups, hint=f"enc{idx}",
        )

    x = conv(x, 0, 7)
    i = 1
    for r in cfg.ratios:
        bn = net_p[f"layers_{i}"]["bn"]
        st = net_s[f"layers_{i}"]["bn"]
        x = b.batch_norm(x, _np(bn["scale"]), _np(bn["bias"]),
                         _np(st["mean"]), _np(st["var"]))
        x = b.leaky_relu(x)
        x = conv(x, i + 2, 2 * r + 1, stride=r)
        i += 3
    x = b.leaky_relu(x)
    x = conv(x, i + 1, 5, groups=2)
    return x


def _residual_stack(b: Builder, x: str, p, cfg: RaveConfig, dim: int) -> str:
    """ResidualStack with v1 geometry: kernel_sizes=(3,), dilations
    ((1,1),(3,1),(5,1)) (models/blocks.py:832-890). Offline mode sums the
    (single) aligned branch directly."""
    branch = p["aligned"]["branches_0"]
    for j, dils in enumerate(cfg.decoder.res_dilations):
        inner = branch[f"layers_{j}"]["net"]["inner"]
        h = x
        for slot, dil in zip((1, 3), dils):
            h = b.leaky_relu(h)
            k = cfg.decoder.res_kernel_sizes[0]
            h = b.conv1d(
                h, _wn(inner[f"layers_{slot}"]), None,
                dilation=dil, pads=get_padding(k, 1, dil, cfg.mode),
                hint=f"res{j}_{slot}",
            )
        x = b.add(x, h)
    return x


def _activation(b: Builder, x: str, cfg: RaveConfig, p) -> str:
    """leaky_relu or Snake (x + sin^2(alpha*x)/(alpha+1e-9), blocks.py:170-182).
    `p` is the layer's param dict ({} / absent for Lambda)."""
    if cfg.activation == "snake":
        alpha = _np(p["alpha"]).reshape(1, -1, 1)
        a = b.const("alpha", alpha)
        s = b.op("Sin", [b.mul(x, a)])
        s2 = b.mul(s, s)
        return b.add(x, b.op("Div", [s2, b.const("alpha_eps", alpha + 1e-9)]))
    return b.leaky_relu(x)


def _residual_unit_v2(b: Builder, x: str, cfg: RaveConfig, p, K: int, dil: int) -> str:
    """Residual(DilatedUnit): x + conv1x1(act(conv_dil(act(x))))
    (blocks.py:307-356, 392-415). Params: inner/net/layers_{0..3}."""
    net = p["inner"]["net"]
    h = _activation(b, x, cfg, net.get("layers_0", {}))
    h = b.conv1d(
        h, _wn(net["layers_1"]), None, dilation=dil,
        pads=get_padding(K, 1, dil, cfg.mode), hint="dconv",
    )
    h = _activation(b, h, cfg, net.get("layers_2", {}))
    h = b.conv1d(h, _wn(net["layers_3"]), None, pads=(0, 0), hint="pconv")
    return b.add(x, h)


def _encoder_v2(b: Builder, x: str, cfg: RaveConfig, params) -> str:
    """EncoderV2 offline forward (blocks.py:451-531); layer indices mirror
    _build() exactly (no adain/recurrent — gated by the caller)."""
    from rave_tpu.models.blocks import normalize_dilations

    net = params["encoder"]["encoder"]["net"]
    K = cfg.encoder.kernel_size or cfg.kernel_size
    eratios = tuple(cfg.encoder.ratios or cfg.ratios)
    dl = normalize_dilations(
        tuple(cfg.encoder.dilations or cfg.dilations), eratios
    )
    x = b.conv1d(
        x, _wn(net["layers_0"]), None,
        pads=get_padding(2 * K + 1, 1, 1, cfg.mode), hint="enc0",
    )
    i = 1
    for r, dils in zip(eratios, dl):
        for d in dils:
            x = _residual_unit_v2(b, x, cfg, net[f"layers_{i}"], K, d)
            i += 1
        x = _activation(b, x, cfg, net.get(f"layers_{i}", {}))
        x = b.conv1d(
            x, _wn(net[f"layers_{i + 1}"]), None, stride=r,
            pads=get_padding(2 * r, r, 1, cfg.mode), hint=f"down{i}",
        )
        i += 2
    x = _activation(b, x, cfg, net.get(f"layers_{i}", {}))
    x = b.conv1d(
        x, _wn(net[f"layers_{i + 1}"]), None,
        pads=get_padding(K, 1, 1, cfg.mode), hint="enc_final",
    )
    return x


def _generator_v2(b: Builder, z: str, cfg: RaveConfig, params) -> str:
    """GeneratorV2 offline forward without the noise branch
    (blocks.py:641-769): mirrored upsampling + residual units, optional
    amplitude modulation, tanh."""
    from rave_tpu.models.blocks import normalize_dilations

    net = params["net"]
    K = cfg.kernel_size
    dl = normalize_dilations(tuple(cfg.dilations), cfg.ratios)[::-1]
    ratios = tuple(cfg.ratios)[::-1]
    x = b.conv1d(
        z, _wn(net["layers_0"]), None, pads=get_padding(K, 1, 1, cfg.mode),
        hint="dec0",
    )
    i = 1
    for r, dils in zip(ratios, dl):
        x = _activation(b, x, cfg, net.get(f"layers_{i}", {}))
        x = b.conv_transpose1d(
            x, _wn(net[f"layers_{i + 1}"]), None, ratio=r,
            crop=r // 2 if cfg.mode == "centered" else 0, hint=f"up{i}",
        )
        i += 2
        for d in dils:
            x = _residual_unit_v2(b, x, cfg, net[f"layers_{i}"], K, d)
            i += 1
    x = _activation(b, x, cfg, net.get(f"layers_{i}", {}))
    wave = b.conv1d(
        x, _wn(params["waveform"]), None,
        pads=get_padding(2 * K + 1, 1, 1, cfg.mode), hint="wave",
    )
    ds = cfg.n_band * 1  # out_data_size, mono
    if cfg.decoder.amplitude_modulation:
        w = b.slice_channels(wave, 0, ds)
        amp = b.slice_channels(wave, ds, 2 * ds)
        wave = b.mul(w, b.op("Sigmoid", [amp]))
    return b.op("Tanh", [wave])


def _generator_v1(b: Builder, z: str, cfg: RaveConfig, params) -> str:
    """GeneratorV1 offline forward, noise branch disabled
    (models/blocks.py:1130-1245)."""
    net_p = params["net"]
    ch = 2 ** len(cfg.ratios) * cfg.capacity
    x = b.conv1d(
        z, _wn(net_p["layers_0"]), None, pads=get_padding(7, 1, 1, cfg.mode),
        hint="dec0",
    )
    idx = 1
    for r in cfg.ratios:
        up = net_p[f"layers_{idx}"]["net"]["layers_1"]
        x = b.leaky_relu(x)
        if r > 1:
            x = b.conv_transpose1d(
                x, _wn(up), None, ratio=r,
                crop=r // 2 if cfg.mode == "centered" else 0,
                hint=f"up{idx}",
            )
        else:
            x = b.conv1d(
                x, _wn(up), None, pads=get_padding(3, 1, 1, cfg.mode),
                hint=f"up{idx}",
            )
        ch //= 2
        x = _residual_stack(b, x, net_p[f"layers_{idx + 1}"], cfg, ch)
        idx += 2

    wave = b.conv1d(
        x, _wn(params["synth"]["branches_0"]), None,
        pads=get_padding(7, 1, 1, cfg.mode), hint="wave",
    )
    loud = b.conv1d(
        x, _wn(params["synth"]["branches_1"]), None,
        pads=get_padding(3, 1, 1, cfg.mode), hint="loud",
    )
    # y = tanh(wave) * mod_sigmoid(loud);  mod_sigmoid(x) = 2*sigmoid(x)**2.3
    # + 1e-7 (ops/dsp.py:13-18); the 1-channel loudness broadcasts over bands
    sig = b.op("Sigmoid", [loud])
    amp = b.op("Pow", [sig, b.const("p", np.asarray(2.3, np.float32))])
    amp = b.add_const(b.mul_const(amp, np.asarray(2.0, np.float32)),
                      np.asarray(1e-7, np.float32))
    return b.mul(b.op("Tanh", [wave]), amp)


def export_onnx_model(
    cfg: RaveConfig,
    variables: Dict[str, Any],
    *,
    deterministic: bool = False,
    doc: str = "",
) -> bytes:
    """Serialize the forward pass to ONNX ModelProto bytes.

    variables: the model's flax collections ({'params', 'batch_stats', ...}).
    Raises NotImplementedError for configurations without an opset-12
    lowering (anything but v1-family without noise, mono, pqmf I/O).
    """
    from rave_tpu.factory import get_pqmf_bank

    def unsupported(why: str):
        raise NotImplementedError(
            f"ONNX export covers the v1 family without noise (the reference's "
            f"onnx.gin scope): {why}. Use `rave-tpu export` (.rtpu / "
            f"StableHLO, export/portable.py) for this configuration."
        )

    kind = (cfg.encoder.kind, cfg.decoder.kind)
    if kind not in (("v1", "v1"), ("v2", "v2")):
        unsupported(f"got encoder/decoder kind {kind}")
    v2 = kind == ("v2", "v2")
    if cfg.latent.family != "variational" or cfg.latent.noise_augmentation:
        unsupported(f"got latent family {cfg.latent.family}"
                    f"+aug{cfg.latent.noise_augmentation}")
    if (cfg.decoder.use_noise if v2 else cfg.decoder.use_noise_v1):
        unsupported("the FFT noise branch has no opset-12 lowering; train "
                    "with use_noise=false (the reference's onnx.gin does the "
                    "same)")
    if cfg.input_mode != "pqmf" or cfg.output_mode != "pqmf":
        unsupported(f"got input/output mode {cfg.input_mode}/{cfg.output_mode}")
    if not v2 and cfg.decoder.loud_stride != 1:
        unsupported(f"got loud_stride {cfg.decoder.loud_stride}")
    if cfg.encoder.repeat_layers != 1 or cfg.encoder.recurrent_layers:
        unsupported("repeat/recurrent encoder layers")
    if cfg.decoder.recurrent_layers:
        unsupported("recurrent decoder layers")
    if cfg.encoder.use_adain or cfg.decoder.use_adain:
        unsupported("AdaIN layers (stateful attribute surface)")
    if cfg.activation not in ("leaky_relu", "snake"):
        unsupported(f"activation {cfg.activation}")

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    bank = get_pqmf_bank(cfg.pqmf_attenuation, cfg.n_band)
    M, Q = bank.n_band, bank.taps

    b = Builder(cfg.name)
    x = b.add_input("audio_in", (1, 1, "audio_length"))

    # ---- PQMF analysis (ops/pqmf.py:140-156) ----------------------------
    if M > 1:
        x = b.reshape(x, (1, -1, M))       # [1, T/M, M]: (n, m) = x[n*M+m]
        x = b.transpose(x, (0, 2, 1))      # NCW [1, M, T/M]
        x = b.conv1d(
            x, bank.analysis_kernel, None,
            pads=(Q // 2, (Q - 1) - Q // 2), hint="pqmf_a",
        )
        x = _reverse_half(b, x, M)

    # ---- encoder + reparametrization ------------------------------------
    if v2:
        z2 = _encoder_v2(b, x, cfg, params)
    else:
        z2 = _encoder_v1(b, x, cfg, params, stats)
    D = cfg.latent_size
    mean = b.slice_channels(z2, 0, D)
    if deterministic:
        z = mean
    else:
        scale = b.slice_channels(z2, D, 2 * D)
        std = b.add_const(b.op("Softplus", [scale]),
                          np.asarray(1e-4, np.float32))
        eps = b.op("RandomNormalLike", [mean])
        z = b.add(mean, b.mul(std, eps))

    # ---- decoder + PQMF synthesis (ops/pqmf.py:158-176) ------------------
    if v2:
        y = _generator_v2(b, z, cfg, params["decoder"])
    else:
        y = _generator_v1(b, z, cfg, params["decoder"])
    if M > 1:
        y = _reverse_half(b, y, M)
        y = b.conv1d(
            y, bank.synthesis_kernel, None,
            pads=((Q - 1) - Q // 2, Q // 2), hint="pqmf_s",
        )
        y = b.transpose(y, (0, 2, 1))
        y = b.reshape(y, (1, 1, -1))

    # ONNX outputs are matched by name — route the result into the declared
    # output with an Identity
    from rave_tpu.export import onnx_proto as P

    b.nodes.append(P.node("Identity", [y], ["audio_out"]))
    b.add_output("audio_out", (1, 1, "audio_length"))
    return b.build(doc=doc or f"rave_tpu {cfg.name} forward (opset 12)")
