"""Streaming == offline equivalence oracle for the conv runtime.

Mirrors the reference's tests/test_residual.py: build a module, run offline
on the full signal and streaming on chunks, then check

    stream[:, D:, :] == offline[:, :T-D, :]

where D is the module's static cumulative delay. The first D streamed
samples are warm-up transient (zero caches vs. real leaked context), so the
comparison skips 2*D on the streamed side — the same oracle as the
reference's tests/test_residual.py:59-68. In 'causal' mode D == 0 and
equality is bit-exact.
"""
import itertools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.nn import (
    GRU,
    AlignBranches,
    Conv1d,
    ConvTranspose1d,
    Residual,
    Sequential,
    stream_chunks,
)
from rave_tpu.nn.combinators import Lambda


def check_equivalence(module, x, chunk, delay, ratio=1, rtol=1e-5, atol=1e-5):
    params = module.init(jax.random.key(0), x)
    cache = params.get("cache", {})
    p = params["params"]
    y_off = module.apply({"params": p}, x)
    y_st, _ = stream_chunks(module, p, cache, x, chunk)
    assert y_st.shape == y_off.shape, (y_st.shape, y_off.shape)
    if delay:
        a = y_st[:, 2 * delay :, :]
        b = y_off[:, delay : y_off.shape[1] - delay, :]
    else:
        a, b = y_st, y_off
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


@pytest.mark.parametrize(
    "kernel,stride,dilation,mode",
    [
        (3, 1, 1, "centered"),
        (3, 1, 1, "causal"),
        (3, 1, 9, "centered"),
        (7, 1, 1, "centered"),
        (9, 4, 1, "centered"),
        (8, 4, 1, "centered"),
        (8, 4, 1, "causal"),
        (5, 2, 1, "centered"),
        (3, 4, 1, "centered"),  # pad-free fat-stride conv (v1 noise gen)
        (1, 1, 1, "centered"),
    ],
)
def test_conv1d(kernel, stride, dilation, mode):
    m = Conv1d(
        in_features=4,
        features=6,
        kernel_size=kernel,
        stride=stride,
        dilation=dilation,
        mode=mode,
        stream_batch=2,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 4)), jnp.float32
    )
    check_equivalence(m, x, chunk=16, delay=m.delay)
    if mode == "causal":
        assert m.delay == 0


@pytest.mark.parametrize("in_delay", [1, 2, 3, 5])
def test_conv1d_strided_with_input_delay(in_delay):
    """A strided conv fed by a delayed stream must round the total delay up
    to a whole output frame via its extra left-shift."""
    m = Conv1d(
        in_features=4,
        features=4,
        kernel_size=9,
        stride=4,
        in_delay=in_delay,
        stream_batch=2,
    )
    assert (in_delay + m.pad[1] + m.extra_delay) % 4 == 0
    # Emulate the delayed stream: offline uses x, streaming gets x delayed.
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 4)), jnp.float32
    )
    params = m.init(jax.random.key(0), x)
    y_off = m.apply({"params": params["params"]}, x)
    xd = jnp.pad(x, ((0, 0), (in_delay, 0), (0, 0)))[:, : x.shape[1], :]
    y_st, _ = stream_chunks(m, params["params"], params["cache"], xd, 16)
    D = m.delay
    np.testing.assert_allclose(
        np.asarray(y_st[:, 2 * D :, :]),
        np.asarray(y_off[:, D : y_off.shape[1] - D, :]),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize(
    "ratio,mode", itertools.product([2, 4, 8], ["centered", "causal"])
)
def test_conv_transpose(ratio, mode):
    m = ConvTranspose1d(
        in_features=4, features=3, ratio=ratio, mode=mode, stream_batch=2
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 4)), jnp.float32
    )
    params = m.init(jax.random.key(0), x)
    y_off = m.apply({"params": params["params"]}, x)
    assert y_off.shape == (2, 32 * ratio, 3)
    y_st, _ = stream_chunks(m, params["params"], params.get("cache", {}), x, 8)
    D = m.delay
    if D:
        a, b = y_st[:, 2 * D :, :], y_off[:, D : y_off.shape[1] - D, :]
    else:
        a, b = y_st, y_off
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_sequential_down_up():
    """Encoder-then-decoder shaped chain: strided down, transpose up."""
    down = Conv1d(in_features=2, features=8, kernel_size=8, stride=4, stream_batch=1)
    mid = Conv1d(
        in_features=8, features=8, kernel_size=3, in_delay=down.delay, stream_batch=1
    )
    up = ConvTranspose1d(
        in_features=8, features=2, ratio=4, in_delay=mid.delay, stream_batch=1
    )
    m = Sequential(layers=(down, Lambda(jax.nn.leaky_relu), mid, up))
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 128, 2)), jnp.float32
    )
    check_equivalence(m, x, chunk=32, delay=up.delay)


def test_residual_alignment():
    inner = Sequential(
        layers=(
            Lambda(jax.nn.leaky_relu),
            Conv1d(in_features=4, features=4, kernel_size=3, dilation=3, stream_batch=2),
            Lambda(jax.nn.leaky_relu),
            Conv1d(in_features=4, features=4, kernel_size=1, in_delay=3, stream_batch=2),
        )
    )
    m = Residual(inner=inner, inner_delay=3, features=4, stream_batch=2)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 64, 4)), jnp.float32
    )
    check_equivalence(m, x, chunk=16, delay=3)


def test_align_branches():
    b1 = Conv1d(in_features=4, features=4, kernel_size=7, stream_batch=2)  # delay 3
    b2 = Conv1d(in_features=4, features=4, kernel_size=3, stream_batch=2)  # delay 1
    m = AlignBranches(
        branches=(b1, b2), delays=(3, 1), features=(4, 4), stream_batch=2
    )

    class Sum(nn.Module):
        align: AlignBranches

        def __call__(self, x):
            a, b = self.align(x)
            return a + b

        def step(self, x):
            a, b = self.align.step(x)
            return a + b

    s = Sum(align=m)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 64, 4)), jnp.float32
    )
    check_equivalence(s, x, chunk=16, delay=3)


def test_gru_stream():
    m = GRU(latent_size=8, num_layers=2, stream_batch=2)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 32, 8)), jnp.float32
    )
    check_equivalence(m, x, chunk=8, delay=0, atol=1e-5)


def test_weight_norm_conv():
    m = Conv1d(
        in_features=4,
        features=6,
        kernel_size=3,
        weight_norm=True,
        stream_batch=2,
    )
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 32, 4)), jnp.float32
    )
    check_equivalence(m, x, chunk=8, delay=m.delay)
