"""True ONNX emission: codec vs torch's official serializer, and the
exported v1 forward graph vs the live jax model.

Role parity: reference scripts/export_onnx.py:76-91 (opset 12, dynamic
audio length). No onnx/onnxruntime in this environment, so:
  * the wire codec is validated against bytes produced by PyTorch's own
    legacy ONNX serializer (reader parses torch output; writer round-trips
    through the reader),
  * numerics are validated with the in-repo interpreter
    (rave_tpu/export/onnx_run.py) against the flax model.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rave_tpu.config import compose
from rave_tpu.export import onnx_proto as P
from rave_tpu.export.onnx_export import export_onnx_model
from rave_tpu.export.onnx_graph import Builder
from rave_tpu.export.onnx_run import run as onnx_run
from rave_tpu.factory import build_rave

TINY = ["onnx"]
TINY_OVERRIDES = ["capacity=8", "latent_size=16", "n_band=8"]


def _torch_reference_bytes(tmp_path):
    """Export a tiny conv net with torch's official (legacy) serializer —
    the ground truth for the wire format."""
    torch = pytest.importorskip("torch")
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    m = torch.nn.Sequential(
        torch.nn.Conv1d(2, 4, 3, stride=2, padding=1),
        torch.nn.LeakyReLU(0.2),
        torch.nn.ConvTranspose1d(4, 1, 4, stride=2, padding=1),
    )
    path = tmp_path / "ref.onnx"
    torch.onnx.export(
        m, torch.randn(1, 2, 64), str(path), opset_version=12, dynamo=False,
        input_names=["audio_in"], output_names=["audio_out"],
        dynamic_axes={"audio_in": {2: "audio_length"}},
    )
    return path.read_bytes(), m


def test_reader_parses_torch_serializer_output(tmp_path):
    data, m = _torch_reference_bytes(tmp_path)
    mod = P.decode_model(data)
    assert mod.ir_version == 7 and mod.opset == 12
    g = mod.graph
    assert [n.op_type for n in g.nodes] == ["Conv", "LeakyRelu", "ConvTranspose"]
    conv = g.nodes[0]
    assert conv.attrs["pads"] == [1, 1] and conv.attrs["strides"] == [2]
    assert g.inputs[0] == ("audio_in", [1, 2, "audio_length"])
    w = g.initializers[conv.inputs[1]].array
    np.testing.assert_allclose(
        w, m[0].weight.detach().numpy(), atol=1e-6
    )


def test_writer_roundtrips_through_reader():
    b = Builder("t")
    x = b.add_input("x", (1, 2, "n"))
    w = np.random.default_rng(0).normal(size=(3, 2, 4)).astype(np.float32)
    y = b.conv1d(x, w, np.zeros(4, np.float32), stride=2, pads=(1, 1))
    y = b.leaky_relu(y, 0.2)
    b.nodes.append(P.node("Identity", [y], ["out"]))
    b.add_output("out", (1, 4, "m"))
    mod = P.decode_model(b.build())
    assert mod.ir_version == 7 and mod.opset == 12
    g = mod.graph
    assert [n.op_type for n in g.nodes] == ["Conv", "LeakyRelu", "Identity"]
    assert g.nodes[0].attrs["pads"] == [1, 1]
    assert g.nodes[1].attrs["alpha"] == pytest.approx(0.2)
    got = g.initializers[g.nodes[0].inputs[1]].array
    np.testing.assert_allclose(got, np.transpose(w, (2, 1, 0)))


def test_interpreter_matches_torch_model(tmp_path):
    """Our interpreter executes torch's own exported graph and reproduces
    the torch module's output (validates Conv/ConvTranspose semantics)."""
    torch = pytest.importorskip("torch")
    data, m = _torch_reference_bytes(tmp_path)
    x = np.random.default_rng(1).normal(size=(1, 2, 64)).astype(np.float32)
    want = m(torch.from_numpy(x)).detach().numpy()
    got = onnx_run(data, {"audio_in": x})["audio_out"]
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = compose(TINY, TINY_OVERRIDES)
    model = build_rave(cfg, n_channels=1, train=False)
    x0 = jnp.zeros((1, 4096, 1), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x0
    )
    variables = {k: v for k, v in variables.items() if k != "cache"}
    return cfg, model, variables


def _jax_forward_mean(cfg, model, variables, x_nwc):
    """encode -> posterior mean -> decode (matches deterministic export)."""
    z = model.apply(variables, x_nwc, method="encode")
    mean = z[..., : cfg.latent_size]
    return model.apply(
        variables, mean, method="decode", rngs={"noise": jax.random.key(0)}
    )


def test_onnx_forward_matches_jax(tiny_model):
    cfg, model, variables = tiny_model
    data = export_onnx_model(cfg, variables, deterministic=True)
    x = (np.random.default_rng(2).normal(size=(1, 1, 4096)) * 0.3).astype(
        np.float32
    )
    got = onnx_run(data, {"audio_in": x})["audio_out"]
    want = _jax_forward_mean(
        cfg, model, variables, jnp.asarray(x.transpose(0, 2, 1))
    )
    want = np.asarray(want).transpose(0, 2, 1)
    assert got.shape == want.shape == x.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_onnx_dynamic_length(tiny_model):
    """One graph serves multiple audio lengths (the reference's
    dynamic_axes contract)."""
    cfg, model, variables = tiny_model
    data = export_onnx_model(cfg, variables, deterministic=True)
    for T in (2048, 8192):
        x = (np.random.default_rng(T).normal(size=(1, 1, T)) * 0.3).astype(
            np.float32
        )
        got = onnx_run(data, {"audio_in": x})["audio_out"]
        assert got.shape == (1, 1, T)
        want = _jax_forward_mean(
            cfg, model, variables, jnp.asarray(x.transpose(0, 2, 1))
        )
        np.testing.assert_allclose(
            got, np.asarray(want).transpose(0, 2, 1), atol=2e-5
        )


def test_onnx_sampling_matches_jax(tiny_model):
    """The stochastic graph (RandomNormalLike, like the traced reference)
    equals the jax reparametrization when fed the same noise."""
    cfg, model, variables = tiny_model
    data = export_onnx_model(cfg, variables, deterministic=False)
    x = (np.random.default_rng(3).normal(size=(1, 1, 4096)) * 0.3).astype(
        np.float32
    )
    D = cfg.latent_size
    z = model.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), method="encode")
    mean, scale = np.split(np.asarray(z), 2, axis=-1)
    eps = np.random.default_rng(4).standard_normal(mean.shape).astype(np.float32)
    std = np.logaddexp(0.0, scale) + 1e-4
    zs = jnp.asarray(mean + std * eps)
    want = model.apply(
        variables, zs, method="decode", rngs={"noise": jax.random.key(0)}
    )
    # interpreter noise is NCW
    got = onnx_run(data, {"audio_in": x}, noise=eps.transpose(0, 2, 1))[
        "audio_out"
    ]
    np.testing.assert_allclose(
        got, np.asarray(want).transpose(0, 2, 1), atol=2e-5
    )


V2_OVERRIDES = [
    "capacity=4", "latent_size=8", "n_band=8", "ratios=[4,2]",
    "dilations=[[1,3],[1]]", "decoder.use_noise=false",
]


@pytest.mark.parametrize("extra", [[], ["snake"]])
def test_onnx_v2_forward_matches_jax(extra):
    """v2-family ONNX export (beyond the reference: its torch exporter
    only covers v1/onnx.gin) — dilated residual units, strided
    downsampling, transpose-conv upsampling, amplitude modulation, and
    the snake activation all lower to opset 12 and match the live model."""
    cfg = compose(["v2"] + extra, V2_OVERRIDES)
    model = build_rave(cfg, n_channels=1, train=False)
    x0 = jnp.zeros((1, 4096, 1), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x0
    )
    variables = {k: v for k, v in variables.items() if k != "cache"}
    data = export_onnx_model(cfg, variables, deterministic=True)
    x = (np.random.default_rng(5).normal(size=(1, 1, 4096)) * 0.3).astype(
        np.float32
    )
    got = onnx_run(data, {"audio_in": x})["audio_out"]
    want = _jax_forward_mean(
        cfg, model, variables, jnp.asarray(x.transpose(0, 2, 1))
    )
    want = np.asarray(want).transpose(0, 2, 1)
    assert got.shape == want.shape == x.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_unsupported_family_raises():
    cfg = compose(["v2_small"])
    model = build_rave(cfg, n_channels=1, train=False)
    with pytest.raises(NotImplementedError, match="StableHLO"):
        export_onnx_model(cfg, {"params": {}})
