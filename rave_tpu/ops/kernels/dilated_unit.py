"""Pallas TPU kernel: fused dilated residual unit.

Computes, in one VMEM-resident pass (one HBM read of x, one write of y):

    a = leaky_relu(x_padded)                    # VPU
    h = sum_k a[t + k*d] @ w1[k]                # K MXU matmuls
    y = leaky_relu(h) @ w2 + x                  # MXU + VPU

which is the v2 DilatedUnit + residual (reference rave/blocks.py:83-112,
31-45). The unfused XLA graph round-trips the conv1 output through HBM
between the two convolutions; fusing keeps the [T_tile, C] intermediate in
VMEM. Used when channel count fits whole weights in VMEM (C <= 512 — the
high-time-resolution layers where the FLOPs are); larger layers fall back
to the lax path.

Backward pass: custom VJP recomputes the forward with the plain jnp
formulation and differentiates it with XLA (rematerialization — no
intermediate storage from the pallas forward is needed).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.2


def _leaky(x):
    return jnp.where(x >= 0, x, NEG_SLOPE * x)


def _reference_impl(x, w1, w2, dilation: int, pad_left: int, pad_right: int):
    """Plain XLA formulation (also the VJP recompute path)."""
    a = _leaky(x)
    h = jax.lax.conv_general_dilated(
        a,
        w1,
        window_strides=(1,),
        padding=((pad_left, pad_right),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    g = _leaky(h)
    y = jax.lax.conv_general_dilated(
        g,
        w2[None],
        window_strides=(1,),
        padding=((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + x


def _kernel(xw_ref, x_ref, w1_ref, w2_ref, y_ref, *, K: int, dilation: int):
    # xw: [1, 1, T_tile + (K-1)*d, C] padded source window (with halo)
    # x : [1, T_tile, C] residual source
    a = _leaky(xw_ref[0, 0])
    T = x_ref.shape[1]
    h = jnp.zeros((T, a.shape[-1]), jnp.float32)
    for k in range(K):
        h = h + jnp.dot(
            a[k * dilation : k * dilation + T, :],
            w1_ref[k],
            preferred_element_type=jnp.float32,
        )
    g = _leaky(h)
    y = jnp.dot(g, w2_ref[:], preferred_element_type=jnp.float32)
    y_ref[0] = (y + x_ref[0].astype(jnp.float32)).astype(y_ref.dtype)


def _pallas_forward(x, w1, w2, dilation: int, pad_left: int, pad_right: int):
    B, T, C = x.shape
    K = w1.shape[0]
    ctx = dilation * (K - 1)
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))

    # T tiling: <= 1024 frames per tile, T padded to a multiple; halo'd
    # windows are materialized per tile (BlockSpec blocks cannot overlap;
    # the duplicated halo is ctx <= 18 frames per tile).
    T_TILE = min(1024, T)
    nT = -(-T // T_TILE)
    T_pad = nT * T_TILE
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, T_pad + ctx - xp.shape[1]), (0, 0)))
    windows = jnp.stack(
        [xp[:, i * T_TILE : i * T_TILE + T_TILE + ctx, :] for i in range(nT)],
        axis=1,
    )  # [B, nT, T_TILE+ctx, C]

    out = pl.pallas_call(
        functools.partial(_kernel, K=K, dilation=dilation),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec(
                (1, 1, T_TILE + ctx, C),
                lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T_TILE, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((K, C, C), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T_TILE, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), x.dtype),
    )(windows, x, w1, w2)
    return out[:, :T, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_dilated_unit(x, w1, w2, dilation: int, pad_left: int, pad_right: int):
    """y = leaky(leaky(x) *conv_d* w1) @ w2 + x, fused on TPU.

    x [B, T, C]; w1 [K, C, C]; w2 [C, C]; 'same' output length requires
    pad_left + pad_right == dilation * (K - 1).
    """
    return _pallas_forward(x, w1, w2, dilation, pad_left, pad_right)


def _fwd(x, w1, w2, dilation, pad_left, pad_right):
    return _pallas_forward(x, w1, w2, dilation, pad_left, pad_right), (x, w1, w2)


def _bwd(dilation, pad_left, pad_right, res, g):
    x, w1, w2 = res
    _, vjp = jax.vjp(
        lambda xx, a, b: _reference_impl(xx, a, b, dilation, pad_left, pad_right),
        x, w1, w2,
    )
    return vjp(g)


fused_dilated_unit.defvjp(_fwd, _bwd)


def pallas_supported(C: int, K: int, dilation: int, T: int) -> bool:
    """Whole-weight VMEM residency bound + TPU backend availability."""
    weight_bytes = (K + 1) * C * C * 4
    tile_bytes = (min(1024, T) + dilation * (K - 1)) * C * 4 * 3
    return weight_bytes + tile_bytes < 12 * 1024 * 1024 and C <= 512
