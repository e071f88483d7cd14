"""Prior training driver (`rave-tpu train_prior`).

Reference: scripts/train_prior.py:65-205 — loads the frozen RAVE, projects
latents through reparametrize -> mean-center -> PCA -> pow2 truncation
(VariationalPrior, rave/prior/model.py:209-227), then teacher-forces the
autoregressive prior with cross-entropy.
"""
from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rave_tpu import config as config_lib
from rave_tpu.data.dataset import get_dataset, split_dataset
from rave_tpu.data.loader import Loader
from rave_tpu.data.store import get_training_channels
from rave_tpu.export.export import load_run
from rave_tpu.factory import build_rave
from rave_tpu.prior.core import DiagonalShift, QuantizedNormal
from rave_tpu.prior.model import Prior, generate, prior_loss, sample_prediction
from rave_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from rave_tpu.utils.logging import MetricsLogger


def train_prior(
    run: str,
    db_path: str,
    name: str,
    out_path: str = "runs",
    batch: int = 8,
    n_signal: int = 131072,
    max_steps: int = 1_000_000,
    val_every: int = 10000,
    fidelity: float = 0.95,
    resolution: int = 32,
    res_size: int = 512,
    skp_size: int = 256,
    kernel_size: int = 3,
    cycle_size: int = 4,
    n_layers: int = 10,
    lr: float = 1e-4,
    smoke_test: bool = False,
    seed: int = 0,
):
    jax.devices()
    cfg, vae_params, vae_state, _, vae_run = load_run(run)
    assert cfg.latent.family == "variational", (
        "the latent prior requires a variational RAVE"
    )
    channels = get_training_channels(db_path, None)
    vae = build_rave(cfg, n_channels=channels, train=False)

    fid = np.asarray(vae_state["buffers"]["fidelity"])
    latent_size = max(int(np.argmax(fid > fidelity)), 1)
    latent_size = 2 ** math.ceil(math.log2(latent_size))
    latent_size = min(latent_size, cfg.latent_size)

    prior = Prior(
        latent_size=latent_size,
        resolution=resolution,
        res_size=res_size,
        skp_size=skp_size,
        kernel_size=kernel_size,
        cycle_size=cycle_size,
        n_layers=n_layers,
    )
    qn = QuantizedNormal(resolution)
    shift = DiagonalShift()

    ratio = cfg.decimation()
    min_rf = 2 ** math.ceil(math.log2(prior.receptive_field * ratio))
    n_signal = max(n_signal, min_rf)

    run_dir = Path(out_path) / f"{name}_prior"
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "prior_config.json").write_text(
        json.dumps(
            dict(
                vae_run=str(vae_run), latent_size=latent_size,
                resolution=resolution, res_size=res_size, skp_size=skp_size,
                kernel_size=kernel_size, cycle_size=cycle_size,
                n_layers=n_layers, fidelity=fidelity,
            ),
            indent=2,
        )
    )
    logger = MetricsLogger(str(run_dir))

    dataset = get_dataset(db_path, cfg.sampling_rate, n_signal)
    train_idx, val_idx = split_dataset(dataset)
    train_loader = Loader(dataset, train_idx, batch, seed=seed)

    vae_vars = {"params": vae_params, **vae_state}

    @jax.jit
    def encode_latents(x, rng):
        """waveform [B, T, C] -> truncated PCA latents [B, T_lat, n]."""

        def run(mdl):
            z = mdl.encoder(mdl.transform_input(x))
            mean, scale = jnp.split(z, 2, axis=-1)
            std = jax.nn.softplus(scale) + 1e-4
            zs = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
            bufs = vae_state["buffers"]
            zs = zs - bufs["latent_mean"]
            zs = zs @ jnp.asarray(bufs["latent_pca"]).T
            return zs[..., :latent_size]

        return vae.apply(vae_vars, rngs={"noise": rng}, method=run)

    @jax.jit
    def decode_latents(z, rng):
        def run(mdl):
            pad = cfg.latent_size - z.shape[-1]
            noise = jax.random.normal(rng, z.shape[:-1] + (pad,), z.dtype)
            bufs = vae_state["buffers"]
            zf = jnp.concatenate([z, noise], axis=-1)
            zf = zf @ jnp.asarray(bufs["latent_pca"]) + bufs["latent_mean"]
            return mdl.decode(zf)

        return vae.apply(vae_vars, rngs={"noise": rng}, method=run)

    # prior train state
    x0 = jnp.zeros((1, 64, resolution * latent_size), jnp.float32)
    params = jax.jit(prior.init)({"params": jax.random.key(seed)}, x0)["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    # XLA:TPU's space_to_batch_converter pass SIGABRTs on the backprop
    # filter conv for batch < 8 (DEVNOTES.md); pad the batch with zero rows
    # to 8 inside the step and average the loss over the real rows only —
    # gradients are identical to the unpadded computation.
    pad_rows = max(8 - batch, 0)

    @jax.jit
    def train_step(params, opt_state, x, rng):
        if pad_rows:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_rows,) + x.shape[1:], x.dtype)], axis=0
            )
        z = encode_latents(x, rng)
        x_oh = qn.encode(shift(z))

        def loss_fn(p):
            return prior_loss(
                prior, p, x_oh, latent_size,
                n_real=batch if pad_rows else None,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    if smoke_test:
        max_steps = 2
        val_every = 1

    rng0 = jax.random.key(seed + 1)
    step = 0
    for x in train_loader.forever():
        if step >= max_steps:
            break
        rng = jax.random.fold_in(rng0, step)
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(x), rng)
        step += 1
        if step % 100 == 0 or step <= 2:
            logger.log(step, {"latent_prediction": float(loss)})
            print(f"prior step {step} ce={float(loss):.4f}", flush=True)
        if step % val_every == 0 or step == max_steps:
            # sample a short generation and decode to audio
            cache = _stream_cache(prior, resolution, latent_size)
            seed_oh = qn.encode(
                jax.random.normal(jax.random.key(step), (1, 1, latent_size))
            )
            n_gen = min(128, n_signal // ratio)
            ys = generate(prior, params, cache, seed_oh, n_gen, jax.random.key(step))
            z_gen = shift.inverse(qn.decode(ys, rng=jax.random.key(step + 1)))
            audio = decode_latents(z_gen, jax.random.key(step + 2))
            logger.log_audio(
                "generation", np.asarray(audio)[0, :, 0], cfg.sampling_rate, step
            )
            save_checkpoint(str(run_dir), step, {"params": params, "opt": opt_state})
    save_checkpoint(str(run_dir), step, {"params": params, "opt": opt_state})
    return str(run_dir)


def _stream_cache(prior: Prior, resolution: int, latent_size: int):
    x = jnp.zeros((1, 1, resolution * latent_size), jnp.float32)
    variables = jax.jit(
        lambda: prior.init({"params": jax.random.key(0)}, x)
    )()
    return jax.tree_util.tree_map(
        lambda v: jnp.zeros(v.shape, v.dtype), variables.get("cache", {})
    )
