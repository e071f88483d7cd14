"""Trace-free DSP primitives (pure JAX, no parameters).

Behavioral contract mirrors the reference's rave/core.py:20-81 and
rave/core.py:236-252 (mod_sigmoid, amp_to_impulse_response, fft_convolve,
mean_difference), re-expressed channels-last for TPU lane efficiency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mod_sigmoid(x: jax.Array) -> jax.Array:
    """Exponentiated sigmoid used for amplitude envelopes.

    Reference: rave/core.py:20-21.
    """
    return 2 * jax.nn.sigmoid(x) ** 2.3 + 1e-7


def amp_to_impulse_response(amp: jax.Array, target_size: int) -> jax.Array:
    """Zero-phase amplitude response -> windowed causal impulse response.

    Operates on the last axis. `amp` holds `F` real frequency-bin amplitudes;
    the result is a length-`target_size` FIR kernel (Hann-windowed, rolled so
    that the linear-phase part sits at the start for fft_convolve).

    Reference: rave/core.py:48-69.
    """
    # Interpret amps as a real, zero-phase spectrum -> symmetric IR.
    ir = jnp.fft.irfft(amp.astype(jnp.complex64), axis=-1)
    filter_size = ir.shape[-1]
    ir = jnp.roll(ir, filter_size // 2, axis=-1)
    win = jnp.hanning(filter_size + 1)[:-1].astype(ir.dtype)  # periodic Hann
    ir = ir * win
    extra = int(target_size) - int(filter_size)
    if extra >= 0:
        ir = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, extra)])
    else:
        # torch's negative pad crops from the end (hit when noise_bands is
        # large vs. the upsampling product, e.g. the v2_small config).
        ir = ir[..., : int(target_size)]
    ir = jnp.roll(ir, -(filter_size // 2), axis=-1)
    return ir


def fft_convolve(signal: jax.Array, kernel: jax.Array) -> jax.Array:
    """Circular-free FFT convolution along the last axis (same length out).

    Reference: rave/core.py:71-81.
    """
    n = signal.shape[-1]
    signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, n)])
    kernel = jnp.pad(kernel, [(0, 0)] * (kernel.ndim - 1) + [(kernel.shape[-1], 0)])
    out = jnp.fft.irfft(jnp.fft.rfft(signal) * jnp.fft.rfft(kernel))
    return out[..., out.shape[-1] // 2 :]


def mean_difference(
    target: jax.Array,
    value: jax.Array,
    norm: str = "L1",
    relative: bool = False,
) -> jax.Array:
    """Mean L1/L2 difference, optionally relative to the target energy.

    Reference: rave/core.py:236-252.
    """
    diff = target - value
    if norm == "L1":
        d = jnp.mean(jnp.abs(diff))
        if relative:
            d = d / (jnp.mean(jnp.abs(target)) + 1e-12)
        return d
    elif norm == "L2":
        d = jnp.mean(diff * diff)
        if relative:
            d = d / (jnp.mean(target * target) + 1e-12)
        return d
    raise ValueError(f"norm must be L1 or L2, got {norm}")


def hinge_gan(score_real: jax.Array, score_fake: jax.Array):
    """Hinge GAN losses -> (dis_loss, gen_loss). Reference: rave/core.py:151-156."""
    loss_dis = jnp.mean(jax.nn.relu(1 - score_real) + jax.nn.relu(1 + score_fake))
    loss_gen = -jnp.mean(score_fake)
    return loss_dis, loss_gen


def ls_gan(score_real: jax.Array, score_fake: jax.Array):
    """Least-squares GAN losses. Reference: rave/core.py:158-162."""
    loss_dis = jnp.mean((score_real - 1) ** 2 + score_fake**2)
    loss_gen = jnp.mean((score_fake - 1) ** 2)
    return loss_dis, loss_gen


def nonsaturating_gan(score_real: jax.Array, score_fake: jax.Array):
    """Non-saturating GAN losses. Reference: rave/core.py:165-170."""
    score_real = jnp.clip(jax.nn.sigmoid(score_real), 1e-7, 1 - 1e-7)
    score_fake = jnp.clip(jax.nn.sigmoid(score_fake), 1e-7, 1 - 1e-7)
    loss_dis = -jnp.mean(jnp.log(score_real) + jnp.log(1 - score_fake))
    loss_gen = -jnp.mean(jnp.log(score_fake))
    return loss_dis, loss_gen


GAN_LOSSES = {
    "hinge": hinge_gan,
    "ls": ls_gan,
    "nonsaturating": nonsaturating_gan,
}


def get_beta_kl(step, warmup, min_beta, max_beta):
    """Log-space beta-KL warmup schedule (jit-safe). Reference: rave/core.py:129-135."""
    t = jnp.clip(step / warmup, 0.0, 1.0)
    beta = jnp.exp(
        t * (jnp.log(max_beta) - jnp.log(min_beta)) + jnp.log(min_beta)
    )
    return jnp.where(step > warmup, max_beta, beta)


def get_beta_kl_cyclic(step, cycle_size, min_beta, max_beta):
    return get_beta_kl(step % cycle_size, cycle_size // 2, min_beta, max_beta)


def get_beta_kl_cyclic_annealed(step, cycle_size, warmup, min_beta, max_beta):
    min_beta = get_beta_kl(step, warmup, min_beta, max_beta)
    return get_beta_kl_cyclic(step, cycle_size, min_beta, max_beta)
