"""Cross-vendor ONNX fixture: PyTorch's own exporter -> rave_tpu's reader.

Round-3's ONNX validation paired rave_tpu's writer (export/onnx_proto.py)
with rave_tpu's interpreter (export/onnx_run.py) — a writer and reader
sharing an author can share blind spots. Here the `.onnx` bytes come from
a *foreign* producer: the reference's own v1 blocks (rave/blocks.py,
executed under torch via tests/_reference_oracle.py), conv-replaced
exactly like reference scripts/export_onnx.py:32-67, and serialized by
``torch.onnx.export`` at opset 12 with a dynamic length axis
(reference scripts/export_onnx.py:76-91). rave_tpu's protobuf reader must
parse it and rave_tpu's interpreter must reproduce torch's outputs — on
the export length AND a different length (the dynamic-axis contract)."""
import functools
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_oracle import load_ref

from rave_tpu.export import onnx_proto as P
from rave_tpu.export import onnx_run


@pytest.fixture(scope="module")
def refblocks():
    rb = load_ref("rave/blocks.py", "refblocks_onnx")
    rb.normalization = lambda m, mode="weight_norm": (
        torch.nn.utils.weight_norm(m)
    )
    cc0 = rb.cc
    ccb = types.SimpleNamespace(
        **{k: getattr(cc0, k) for k in dir(cc0) if not k.startswith("_")}
    )
    ccb.Conv1d = functools.partial(cc0.Conv1d, bias=False)
    ccb.ConvTranspose1d = functools.partial(cc0.ConvTranspose1d, bias=False)
    rb.cc = ccb
    # the stock v1 bindings the gin stub drops (v1.gin:66-68)
    rb.ResidualStack = functools.partial(
        rb.ResidualStack, kernel_sizes=[3],
        dilations_list=[[1, 1], [3, 1], [5, 1]],
    )
    return rb


def _replace_convs(model, cc):
    """The reference's recursive cc->nn conv replacement
    (scripts/export_onnx.py:32-67): padding folds into the Conv node."""
    import torch.nn as nn

    conv_cls = getattr(cc.Conv1d, "func", cc.Conv1d)
    convt_cls = getattr(cc.ConvTranspose1d, "func", cc.ConvTranspose1d)
    cc = types.SimpleNamespace(Conv1d=conv_cls, ConvTranspose1d=convt_cls)
    for name, child in model.named_children():
        if isinstance(child, cc.Conv1d):
            conv = nn.Conv1d(
                child.in_channels, child.out_channels, child.kernel_size,
                child.stride, child._pad[0], child.dilation, child.groups,
                child.bias is not None,
            )
            conv.weight.data.copy_(child.weight.data)
            if child.bias is not None:
                conv.bias.data.copy_(child.bias.data)
            setattr(model, name, conv)
        elif isinstance(child, cc.ConvTranspose1d):
            conv = nn.ConvTranspose1d(
                child.in_channels, child.out_channels, child.kernel_size,
                child.stride, child.padding, child.output_padding,
                child.groups, child.bias is not None, child.dilation,
            )
            conv.weight.data.copy_(child.weight.data)
            if child.bias is not None:
                conv.bias.data.copy_(child.bias.data)
            setattr(model, name, conv)
        else:
            _replace_convs(child, cc)


def _export_onnx_bytes(module, x, tmp_path):
    path = tmp_path / "ref_v1.onnx"
    kwargs = dict(
        export_params=True,
        opset_version=12,
        input_names=["audio_in"],
        output_names=["audio_out"],
        dynamic_axes={"audio_in": {2: "audio_length"}, "audio_out": [0]},
        do_constant_folding=False,
    )
    # torch's torchscript exporter imports the `onnx` package (absent in
    # this env) solely to inline onnx-script custom functions — this graph
    # has none, so the post-pass is the identity on the serialized proto
    try:
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

        orig = onnx_proto_utils._add_onnxscript_fn
        onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto
    except ImportError:
        orig = None
    try:
        try:
            # torch >= 2.6 routes to the dynamo exporter by default; the
            # reference targets the legacy opset-12 path
            torch.onnx.export(module, (x,), str(path), dynamo=False, **kwargs)
        except TypeError:
            torch.onnx.export(module, (x,), str(path), **kwargs)
    finally:
        if orig is not None:
            onnx_proto_utils._add_onnxscript_fn = orig
    return path.read_bytes()


@pytest.mark.slow
def test_reference_v1_onnx_parses_and_matches_torch(refblocks, tmp_path):
    torch.manual_seed(0)
    rb = refblocks
    latent, data_size, capacity = 8, 16, 8
    ratios = [4, 4]
    enc = rb.Encoder(
        data_size=data_size, capacity=capacity, latent_size=latent,
        ratios=ratios, n_out=2, sample_norm=False, repeat_layers=1,
    )
    gen = rb.Generator(
        latent_size=latent, capacity=capacity, data_size=data_size,
        ratios=ratios, loud_stride=1, use_noise=False,
    )

    class Forward(torch.nn.Module):
        """encode(mean latent) -> decode, the reference forward scope with
        onnx.gin's no-noise binding."""

        def __init__(self):
            super().__init__()
            self.enc = enc
            self.gen = gen

        def forward(self, x):
            z = self.enc(x)
            mean = torch.split(z, z.shape[1] // 2, 1)[0]
            return self.gen(mean)

    model = Forward().eval()
    for m in model.modules():
        if hasattr(m, "weight_g") or hasattr(m, "parametrizations"):
            try:
                torch.nn.utils.remove_weight_norm(m)
            except ValueError:
                pass
    _replace_convs(model, rb.cc)

    T = 1024
    x = torch.randn(1, data_size, T)
    with torch.no_grad():
        y_ref = model(x).numpy()
    blob = _export_onnx_bytes(model, x, tmp_path)

    # 1. rave_tpu's protobuf reader parses the torch-serialized file
    m = P.decode_model(blob)
    assert m.opset >= 9  # torch stamps its chosen opset imports
    names = [n for n, _ in m.graph.inputs]
    assert "audio_in" in names

    # 2. rave_tpu's interpreter reproduces torch's output on the export
    #    length and on a longer input (the dynamic-length contract)
    out = onnx_run.run(blob, {"audio_in": x.numpy()})
    y = out["audio_out"]
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-4)

    x2 = torch.randn(1, data_size, 2 * T)
    with torch.no_grad():
        y2_ref = model(x2).numpy()
    y2 = onnx_run.run(blob, {"audio_in": x2.numpy()})["audio_out"]
    np.testing.assert_allclose(y2, y2_ref, atol=1e-5, rtol=1e-4)
