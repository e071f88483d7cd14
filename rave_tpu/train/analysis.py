"""Validation-time analytics: receptive-field probe and latent PCA.

Reference: rave/core.py:180-217 (autograd receptive-field probe) and
rave/model.py:445-495 (PCA -> latent_pca/latent_mean/fidelity buffers).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.config import RaveConfig


def receptive_field(cfg: RaveConfig, n_channels: int = 1) -> Tuple[int, int]:
    """(left, right) receptive field of encode+decode, in raw samples.

    The probe is architectural — connectivity of the conv graph — so it
    runs on a freshly-initialized GRU-free clone (the reference disables
    recurrent layers for the same reason, rave/core.py:186-189). Doubles N
    until the gradient footprint fits (rave/core.py:190-205).
    """
    import dataclasses

    from rave_tpu.factory import build_rave

    probe_cfg = dataclasses.replace(cfg)
    probe_cfg.encoder = dataclasses.replace(cfg.encoder, recurrent_layers=0)
    probe_cfg.decoder = dataclasses.replace(cfg.decoder, recurrent_layers=0)
    model = build_rave(probe_cfg, n_channels=n_channels, train=False)

    N = 2**15
    while True:
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, N, n_channels)),
            jnp.float32,
        )
        variables = jax.jit(model.init)(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
        )
        variables = {k: v for k, v in variables.items() if k != "cache"}

        def probe(xx):
            def run(mdl):
                z = mdl.encoder(mdl.transform_input(xx))
                zs, _ = mdl.reparametrize(z, rng=jax.random.key(2))
                y = mdl.decode(zs)
                return y[0, y.shape[1] // 2, 0]

            return model.apply(
                variables, rngs={"noise": jax.random.key(3)}, method=run
            )

        grad = jax.jit(jax.grad(probe))(x)
        g = np.abs(np.asarray(grad).reshape(-1, n_channels)[:, 0])
        if g[0] == 0 and g[-1] == 0:
            nz = np.nonzero(g > 0)[0]
            mid = N // 2
            lrf = int(mid - nz.min()) if len(nz) else 0
            rrf = int(nz.max() - mid) if len(nz) else 0
            return lrf, rrf
        N *= 2
        if N > 2**21:
            raise RuntimeError("receptive field larger than 2^21 samples")


def pca(latents: np.ndarray):
    """Full PCA of [N, D] latents -> (components [D, D], mean [D],
    cumulative explained-variance 'fidelity' [D]). numpy SVD stand-in for
    sklearn.PCA (reference rave/model.py:463-488)."""
    mean = latents.mean(0)
    z = latents - mean
    # SVD of the centered data: rows of Vt are the principal axes.
    _, s, vt = np.linalg.svd(z, full_matrices=False)
    var = s**2 / max(len(z) - 1, 1)
    ratio = var / var.sum()
    fidelity = np.cumsum(ratio)
    comp = vt
    if comp.shape[0] < z.shape[1]:  # fewer samples than dims: pad basis
        pad = np.eye(z.shape[1])[comp.shape[0] :]
        comp = np.concatenate([comp, pad], 0)
        fidelity = np.pad(fidelity, (0, z.shape[1] - len(fidelity)), constant_values=1.0)
    return comp.astype(np.float32), mean.astype(np.float32), fidelity.astype(np.float32)
