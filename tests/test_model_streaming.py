"""Full-model streaming == offline equivalence (the export-path guarantee).

Builds a tiny v2 RAVE, runs offline encode/decode on a long signal and the
streaming step path on chunks, and checks alignment through the *entire*
stack (PQMF analysis -> encoder -> decoder -> PQMF synthesis) using the
static delay metadata. In causal mode the equivalence is exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.config import compose
from rave_tpu.factory import build_rave

TINY = [
    "capacity=2",
    "discriminator.capacity=2",
    "latent_size=4",
    "ratios=[4,4,2]",
    "dilations=[[1,3],[1,3],[1]]",
]


def rel_close(a, b, tol=1e-3):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max() + 1e-9
    err = np.abs(a - b).max() / scale
    assert err < tol, f"relative error {err:.2e} (scale {scale:.2e})"


def _build(names, extra=(), n_channels=1):
    cfg = compose(names, TINY + list(extra))
    model = build_rave(cfg, n_channels=n_channels, train=False, stream_batch=1)
    return cfg, model


def _init(model, x):
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )
    cache = variables.get("cache", {})
    rest = {k: v for k, v in variables.items() if k != "cache"}
    return rest, cache


@pytest.mark.parametrize("mode", ["causal", "centered"])
def test_encode_stream_equivalence(mode):
    names = ["v2"] + (["causal"] if mode == "causal" else [])
    cfg, model = _build(names)
    block = cfg.block_size()
    T = block * 48  # enough latent frames to survive the 2*delay crop
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, T, 1)) * 0.3, jnp.float32
    )
    variables, cache = _init(model, x)

    z_off = model.apply(variables, x, method="encode")

    zs = []
    v = {**variables, "cache": cache}
    for i in range(0, T, block):
        z, upd = model.apply(
            v, x[:, i : i + block], method="step_encode", mutable=["cache"]
        )
        v = {**variables, "cache": upd["cache"]}
        zs.append(z)
    z_st = jnp.concatenate(zs, axis=1)
    assert z_st.shape == z_off.shape

    D = model.encode_delay
    if mode == "causal":
        assert D == 0
        np.testing.assert_allclose(
            np.asarray(z_st), np.asarray(z_off), rtol=1e-4, atol=1e-5
        )
    else:
        rel_close(z_st[:, 2 * D :], z_off[:, D : z_off.shape[1] - D])


@pytest.mark.parametrize("mode", ["causal", "centered"])
def test_decode_stream_equivalence(mode):
    names = ["v2"] + (["causal"] if mode == "causal" else [])
    cfg, model = _build(names)
    dec = 1
    for r in cfg.enc_ratios():
        dec *= r
    block_lat = max(cfg.block_size() // (cfg.n_band * dec), 2)
    T_lat = block_lat * 8
    z = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, T_lat, cfg.latent_size)),
        jnp.float32,
    )
    x0 = jnp.zeros((1, cfg.block_size() * 2, 1), jnp.float32)
    variables, cache = _init(model, x0)

    y_off = model.apply(variables, z, method="decode")
    ys = []
    v = {**variables, "cache": cache}
    for i in range(0, T_lat, block_lat):
        y, upd = model.apply(
            v, z[:, i : i + block_lat], method="step_decode", mutable=["cache"]
        )
        v = {**variables, "cache": upd["cache"]}
        ys.append(y)
    y_st = jnp.concatenate(ys, axis=1)
    assert y_st.shape == y_off.shape

    D = model.decode_delay
    if mode == "causal":
        assert D == 0
        np.testing.assert_allclose(
            np.asarray(y_st), np.asarray(y_off), rtol=1e-4, atol=1e-5
        )
    else:
        rel_close(y_st[:, 2 * D :], y_off[:, D : y_off.shape[1] - D])


@pytest.mark.parametrize("mode", ["causal", "centered"])
def test_v1_stream_equivalence(mode):
    """v1 family (EncoderV1/GeneratorV1: BatchNorm encoder, UpsampleLayer,
    multi-kernel ResidualStack, AlignBranches synth; noise disabled for
    determinism — the 'onnx' preset)."""
    names = ["onnx"] + (["causal"] if mode == "causal" else [])
    cfg, model = _build(names, extra=["decoder.res_kernel_sizes=[3]"])
    block = cfg.block_size()
    T = block * 48
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, T, 1)) * 0.3, jnp.float32
    )
    variables, cache = _init(model, x)

    z_off = model.apply(variables, x, method="encode")
    zs = []
    v = {**variables, "cache": cache}
    for i in range(0, T, block):
        z, upd = model.apply(
            v, x[:, i : i + block], method="step_encode", mutable=["cache"]
        )
        v = {**variables, "cache": upd["cache"]}
        zs.append(z)
    z_st = jnp.concatenate(zs, axis=1)
    D = model.encode_delay
    if mode == "causal":
        assert D == 0
        np.testing.assert_allclose(
            np.asarray(z_st), np.asarray(z_off), rtol=1e-4, atol=1e-5
        )
    else:
        rel_close(z_st[:, 2 * D :], z_off[:, D : z_off.shape[1] - D], tol=2e-3)

    # decoder path
    dec = 1
    for r in cfg.enc_ratios():
        dec *= r
    block_lat = max(block // (cfg.n_band * dec), 2)
    # enough latent frames that 2 * decode_delay fits inside the signal
    T_lat = block_lat * max(8, -(-4 * model.decode_delay // (dec * cfg.n_band * block_lat)))
    zl = jnp.asarray(
        np.random.default_rng(10).standard_normal((1, T_lat, cfg.latent_size)),
        jnp.float32,
    )
    y_off = model.apply(variables, zl, method="decode")
    ys = []
    v = {**variables, "cache": cache}
    for i in range(0, T_lat, block_lat):
        y, upd = model.apply(
            v, zl[:, i : i + block_lat], method="step_decode", mutable=["cache"]
        )
        v = {**variables, "cache": upd["cache"]}
        ys.append(y)
    y_st = jnp.concatenate(ys, axis=1)
    Dd = model.decode_delay
    if mode == "causal":
        assert Dd == 0
        np.testing.assert_allclose(
            np.asarray(y_st), np.asarray(y_off), rtol=1e-4, atol=1e-5
        )
    else:
        rel_close(y_st[:, 2 * Dd :], y_off[:, Dd : y_off.shape[1] - Dd], tol=2e-3)


def test_mel_stream_equivalence():
    """Hybrid (mel-input) encode streaming matches offline."""
    cfg, model = _build(
        ["hybrid"],
        # mel_hop shrinks with the encoder ratios so the config stays
        # rate-preserving (compose() enforces it): 128*4 == 32*16 == 512
        extra=["encoder.ratios=[2,2]", "encoder.dilations=[1]", "mel_hop=128"],
    )
    block = cfg.block_size()
    T = block * 24
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((1, T, 1)) * 0.3, jnp.float32
    )
    variables, cache = _init(model, x)
    z_off = model.apply(variables, x, method="encode")
    zs = []
    v = {**variables, "cache": cache}
    for i in range(0, T, block):
        z, upd = model.apply(
            v, x[:, i : i + block], method="step_encode", mutable=["cache"]
        )
        v = {**variables, "cache": upd["cache"]}
        zs.append(z)
    z_st = jnp.concatenate(zs, axis=1)
    assert z_st.shape == z_off.shape
    D = model.encode_delay
    rel_close(z_st[:, 2 * D :], z_off[:, D : z_off.shape[1] - D], tol=5e-3)


def test_pqmf_module_stream():
    from rave_tpu.models.pqmf_module import PQMFAnalysis, PQMFSynthesis
    from rave_tpu.ops.pqmf import PQMFBank

    bank = PQMFBank.build(100, 8)
    ana = PQMFAnalysis(bank=bank, mode="centered", stream_batch=1)
    syn = PQMFSynthesis(bank=bank, mode="centered", stream_batch=1)
    T = 8192
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, T, 1)), jnp.float32
    )
    va = ana.init({"params": jax.random.key(0)}, x)
    z_off = ana.apply({k: v for k, v in va.items() if k != "cache"}, x)

    zs = []
    cache = va["cache"]
    for i in range(0, T, 2048):
        z, upd = ana.apply(
            {"cache": cache}, x[:, i : i + 2048], method="step", mutable=["cache"]
        )
        cache = upd["cache"]
        zs.append(z)
    z_st = jnp.concatenate(zs, axis=1)
    D = ana.delay
    rel_close(z_st[:, 2 * D :], z_off[:, D : z_off.shape[1] - D], tol=1e-4)

    # synthesis stream
    vs = syn.init({"params": jax.random.key(0)}, z_off)
    y_off = syn.apply({k: v for k, v in vs.items() if k != "cache"}, z_off)
    ys = []
    cache = vs["cache"]
    F = z_off.shape[1]
    for i in range(0, F, 256):
        y, upd = syn.apply(
            {"cache": cache}, z_off[:, i : i + 256], method="step", mutable=["cache"]
        )
        cache = upd["cache"]
        ys.append(y)
    y_st = jnp.concatenate(ys, axis=1)
    Ds = syn.delay
    rel_close(y_st[:, 2 * Ds :], y_off[:, Ds : y_off.shape[1] - Ds], tol=1e-4)
