"""Pseudo-QMF multiband analysis/synthesis, designed for TPU execution.

Filter design (SciPy, at build time — trace-free constant folding):
  * Kaiser-windowed lowpass prototype whose cutoff is optimized by
    Nelder-Mead over the objective from IEEE 681427, as in the reference
    (rave/pqmf.py:55-89).
  * Cosine modulation into M bands (rave/pqmf.py:32-52).

Runtime (JAX): both directions are expressed as *polyphase* dense NWC
convolutions at the decimated rate — M-channel matmuls that map straight
onto the MXU — rather than strided scalar convs. The same weights are reused
by the streaming conv runtime (rave_tpu/nn/conv.py), which is the TPU-native
equivalent of the reference's CachedPQMF (rave/pqmf.py:245-294).

Conventions (channels-last):
  analyze : [B, T]        -> [B, T//M, M]
  synthesize: [B, T//M, M] -> [B, T]
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import fmin
from scipy.signal import firwin, kaiserord


def kaiser_filter(wc: float, atten: float, N: int | None = None) -> np.ndarray:
    """Kaiser lowpass design; `wc` is angular cutoff. Reference: rave/pqmf.py:55-70."""
    N_, beta = kaiserord(atten, wc / np.pi)
    N_ = 2 * (N_ // 2) + 1
    N = N if N is not None else N_
    h = firwin(N, wc, window=("kaiser", beta), scale=False, fs=2 * np.pi)
    return h


def _loss_wc(wc: float, atten: float, M: int, N: int | None) -> float:
    """Max of the decimated composite-response ripple (IEEE 681427 objective)."""
    h = kaiser_filter(wc, atten, N)
    g = np.convolve(h, h[::-1], "full")
    g = abs(g[g.shape[-1] // 2 :: 2 * M][1:])
    return np.max(g)


def get_prototype(atten: float, M: int, N: int | None = None) -> np.ndarray:
    """Optimized lowpass prototype for an M-band PQMF. Reference: rave/pqmf.py:83-89."""
    wc = fmin(lambda w: _loss_wc(float(w), atten, M, N), 1 / M, disp=0)[0]
    return kaiser_filter(float(wc), atten, N)


def qmf_bank(h: np.ndarray, n_band: int) -> np.ndarray:
    """Cosine-modulate a prototype into an M-band filterbank [M, L].

    Reference: rave/pqmf.py:32-52.
    """
    k = np.arange(n_band).reshape(-1, 1)
    N = h.shape[-1]
    t = np.arange(-(N // 2), N // 2 + 1)
    p = (-1) ** k * np.pi / 4
    mod = np.cos((2 * k + 1) * np.pi / (2 * n_band) * t + p)
    return 2 * h * mod


def _center_pad_next_pow_2(x: np.ndarray) -> np.ndarray:
    next_2 = 2 ** math.ceil(math.log2(x.shape[-1]))
    pad = next_2 - x.shape[-1]
    return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad // 2, pad // 2 + pad % 2)])


def reverse_half(x: jax.Array, offset: int = 0) -> jax.Array:
    """Alternate the sign of odd bands at even frames so every band is a
    proper baseband signal (involution). Reference: rave/pqmf.py:13-17, but
    for channels-last [..., T, M] layout.

    `offset` shifts the alternation phase: streaming paths whose frame
    stream lags the offline timeline by an odd number of frames pass
    offset=1 so the signs track *offline* frame parity.
    """
    t, m = x.shape[-2], x.shape[-1]
    sign = np.ones((t + 1, m), dtype=np.float32)
    sign[::2, 1::2] = -1
    sign = sign[offset % 2 : offset % 2 + t]
    return x * jnp.asarray(sign, dtype=x.dtype)


@dataclass(frozen=True)
class PQMFBank:
    """Constant-folded PQMF filterbank.

    `analysis_kernel`  : [Q, M, M] NWC conv weight (width Q = L//M taps,
                         in = M polyphase components, out = M bands).
    `synthesis_kernel` : [Q, M, M] NWC conv weight (in = M bands,
                         out = M polyphase components of the waveform).

    Both run at the decimated rate, so each tap is an MxM matmul (MXU).
    """

    attenuation: int
    n_band: int
    analysis_kernel: np.ndarray = field(repr=False, compare=False, default=None)
    synthesis_kernel: np.ndarray = field(repr=False, compare=False, default=None)

    @staticmethod
    def build(attenuation: int, n_band: int) -> "PQMFBank":
        if n_band == 1:
            return PQMFBank(attenuation, 1, None, None)
        power = math.log2(n_band)
        assert power == math.floor(power), "n_band must be a power of 2"
        h = get_prototype(attenuation, n_band)
        hk = _center_pad_next_pow_2(qmf_bank(h, n_band))  # [M, L], L = 2^p
        M, L = hk.shape
        Q = L // M
        # Analysis: z[n, k] = sum_{q, m} W[q, m, k] * frames[n + q - pad, m]
        # with frames[n, m] = x[n * M + m]  =>  W[q, m, k] = hk[k, q*M + m].
        analysis = hk.reshape(M, Q, M).transpose(1, 2, 0)  # [Q, m, k]
        # Synthesis is the matched filter of the correlation analysis:
        #   xhat[t] = M * sum_{k, n} z_valid[n, k] * hk[k, t - n*M]
        # (verified delay-0, SNR-identical to the reference's
        # polyphase_inverse, rave/pqmf.py:110-134). As an NWC correlation
        # kernel with left pads satisfying P_l + S_l = Q - 1:
        #   V[q, k, m] = M * hk[k, (Q-1-q)*M + m]   (flip in q only).
        synthesis = M * hk.reshape(M, Q, M)[:, ::-1, :].transpose(1, 0, 2)
        return PQMFBank(
            attenuation,
            n_band,
            analysis.astype(np.float32),
            synthesis.astype(np.float32),
        )

    @property
    def taps(self) -> int:
        """Kernel width Q in decimated frames (0 if single band)."""
        return 0 if self.n_band == 1 else self.analysis_kernel.shape[0]

    # ---- offline (centered) paths; streaming uses rave_tpu.nn.conv ------

    def analyze(self, x: jax.Array) -> jax.Array:
        """[B, T] -> [B, T//M, M] (centered offline path)."""
        if self.n_band == 1:
            return x[..., None]
        M = self.n_band
        B, T = x.shape
        frames = x.reshape(B, T // M, M)
        Q = self.taps
        pad = (Q // 2, (Q - 1) - Q // 2)
        z = jax.lax.conv_general_dilated(
            frames,
            jnp.asarray(self.analysis_kernel, dtype=x.dtype),
            window_strides=(1,),
            padding=(pad,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return reverse_half(z)

    def synthesize(self, z: jax.Array) -> jax.Array:
        """[B, T//M, M] -> [B, T] (centered offline path)."""
        if self.n_band == 1:
            return z[..., 0]
        M = self.n_band
        z = reverse_half(z)
        Q = self.taps
        # Zero-delay round trip requires analysis_left + synthesis_left
        # pads = Q - 1; the analysis used Q//2 on the left.
        pad = ((Q - 1) - Q // 2, Q // 2)
        y = jax.lax.conv_general_dilated(
            z,
            jnp.asarray(self.synthesis_kernel, dtype=z.dtype),
            window_strides=(1,),
            padding=(pad,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        B, N, _ = y.shape
        return y.reshape(B, N * M)
