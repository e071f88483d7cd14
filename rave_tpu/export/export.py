"""Exporter: run dir -> self-describing .rtpu artifact.

The `rave export` equivalent (scripts/export.py:492-599): loads the newest
checkpoint (optionally EMA weights), truncates the variational latent space
to the requested fidelity, builds the streaming-mode model, snapshots
params + zeroed stream caches + the manifest, and AOT-lowers the streaming
step functions to StableHLO for C++ PJRT consumers.
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

from rave_tpu import config as config_lib
from rave_tpu.factory import build_discriminator, build_rave
from rave_tpu.train.state import create_train_state
from rave_tpu.utils.checkpoint import (
    restore_checkpoint,
    search_for_config,
    search_for_run,
)


def load_run(run: str, use_ema: bool = False):
    """(cfg, gen_params, model_state, n_channels) from a run directory."""
    run_dir = search_for_run(run)
    if run_dir is None:
        raise FileNotFoundError(f"no checkpoints under {run}")
    cfg_path = search_for_config(run_dir)
    cfg = config_lib.from_dict(json.loads(Path(cfg_path).read_text()))
    # rebuild the state template to restore into
    meta_channels = cfg.data.n_channels
    model = build_rave(cfg, n_channels=meta_channels, train=True)
    dis = build_discriminator(cfg, n_channels=meta_channels)
    template = create_train_state(cfg, model, dis, jax.random.key(0))
    state = restore_checkpoint(run_dir, template)
    if state is None:
        raise FileNotFoundError(f"could not restore checkpoint from {run_dir}")
    params = state.ema_params if (use_ema and state.ema_params is not None) else state.gen_params
    return cfg, params, state.model_state, meta_channels, run_dir


def export_model(
    run: str,
    streaming: bool = False,
    fidelity: float = 0.95,
    stereo: bool = False,
    use_ema: bool = False,
    channels: Optional[int] = None,
    target_sr: Optional[int] = None,
    output: Optional[str] = None,
    prior: Optional[str] = None,
) -> str:
    cfg, params, model_state, n_channels, run_dir = load_run(run, use_ema)
    n_channels = channels or n_channels
    stream_batch = 2 if stereo else 1

    # fidelity -> truncated latent size (reference export.py:119-124)
    full_latent = cfg.latent_size
    latent_size = full_latent
    fam = cfg.latent.family
    if fam == "variational":
        fid = np.asarray(model_state["buffers"]["fidelity"])
        latent_size = max(int(np.argmax(fid > fidelity)), 1)
        latent_size = 2 ** math.ceil(math.log2(latent_size))
        latent_size = min(latent_size, full_latent)
    elif fam == "discrete":
        latent_size = cfg.latent.num_quantizers
    elif fam == "spherical":
        latent_size = full_latent - 1

    model = build_rave(
        cfg, n_channels=n_channels, train=False, stream_batch=stream_batch
    )
    block = cfg.block_size()
    x = jnp.zeros((stream_batch, block, n_channels), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )
    cache = variables.get("cache", {})

    ratio = cfg.decimation()
    name = cfg.name + ("_streaming" if streaming else "")
    out_dir = Path(output or run_dir) / f"{name}.rtpu"
    out_dir.mkdir(parents=True, exist_ok=True)

    # optional prior bundling (reference export.py:543-558, TraceModel)
    if prior is not None:
        prior_run = search_for_run(prior)
        pcfg_path = Path(prior_run) / "prior_config.json"
        pcfg = json.loads(pcfg_path.read_text())
        import orbax.checkpoint as ocp

        from rave_tpu.utils.checkpoint import latest_checkpoint

        ckpt = latest_checkpoint(prior_run)
        restored = ocp.StandardCheckpointer().restore(ckpt)
        (out_dir / "prior.json").write_text(json.dumps(pcfg, indent=2))
        (out_dir / "prior_params.msgpack").write_bytes(
            flax.serialization.to_bytes(restored["params"])
        )
        manifest_prior = dict(pcfg)
    else:
        manifest_prior = None


    manifest = {
        "format": "rtpu-v1",
        "name": cfg.name,
        "streaming": streaming,
        "sampling_rate": cfg.sampling_rate,
        "target_sampling_rate": target_sr or cfg.sampling_rate,
        "n_channels": n_channels,
        "stream_batch": stream_batch,
        "stereo": stereo,
        "block_size": block,
        "latent_family": fam,
        "latent_size": int(latent_size),
        "full_latent_size": int(cfg.augmented_latent_size()),
        "latent_rate_hz": cfg.sampling_rate / ratio,
        "methods": {
            "encode": {
                "in_channels": n_channels,
                "in_ratio": 1,
                "out_channels": int(latent_size),
                "out_ratio": ratio,
                "input_labels": [f"(signal) input {i}" for i in range(n_channels)],
                "output_labels": [f"(signal) latent {i}" for i in range(latent_size)],
            },
            "decode": {
                "in_channels": int(latent_size),
                "in_ratio": ratio,
                "out_channels": n_channels,
                "out_ratio": 1,
                "input_labels": [f"(signal) latent {i}" for i in range(latent_size)],
                "output_labels": [f"(signal) output {i}" for i in range(n_channels)],
            },
            "forward": {
                "in_channels": n_channels,
                "in_ratio": 1,
                "out_channels": n_channels,
                "out_ratio": 1,
                "input_labels": [f"(signal) input {i}" for i in range(n_channels)],
                "output_labels": [f"(signal) output {i}" for i in range(n_channels)],
            },
        },
        "latency": {
            "encode_latent_frames": model.encode_delay,
            "decode_samples": model.decode_delay,
            "total_samples": model.encode_delay * ratio + model.decode_delay,
        },
        "attributes": (
            ["learn_target", "reset_target", "learn_source", "reset_source"]
            if (cfg.encoder.use_adain or cfg.decoder.use_adain)
            else []
        ),
        "config": config_lib.to_dict(cfg),
        "prior": manifest_prior,
        "version": 1,
    }

    # params + buffers (+ adain) with the *trained* weights; caches zeroed
    save_vars = {"params": params}
    for k, v in model_state.items():
        save_vars[k] = v
    save_vars["cache"] = cache
    (out_dir / "params.msgpack").write_bytes(
        flax.serialization.to_bytes(save_vars)
    )
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))

    # VST stereo-compat smoke test (reference export.py:587-596): decoding a
    # batch-2 zero latent must produce the declared channel layout.
    try:
        from rave_tpu.export.artifact import ExportedRAVE

        art = ExportedRAVE(str(out_dir))
        z0 = jnp.zeros((stream_batch, 8, int(latent_size)), jnp.float32)
        y0 = art.decode(z0)
        assert y0.shape[0] == stream_batch and y0.shape[2] == n_channels, (
            f"stereo/VST smoke decode produced {y0.shape}"
        )
    except AssertionError:
        raise
    except Exception as e:  # noqa: BLE001 — smoke is best effort on CPU CI
        (out_dir / "smoke_warning.txt").write_text(repr(e))

    # AOT StableHLO lowering of the streaming step functions (consumable by
    # a C++ PJRT host without Python) — the TorchScript-artifact analog.
    try:
        from jax import export as jex

        zc = jnp.zeros((stream_batch, block, n_channels), jnp.float32)

        def enc_step(variables, xx):
            out, upd = model.apply(
                variables, xx, method="step_encode", mutable=["cache"],
                rngs={"noise": jax.random.key(0)},
            )
            return out, upd

        full_vars = {**save_vars}
        exp = jex.export(jax.jit(enc_step))(full_vars, zc)
        (out_dir / "encode_step.stablehlo").write_bytes(exp.serialize())
    except Exception as e:  # noqa: BLE001 — AOT export is best-effort
        (out_dir / "stablehlo_export_error.txt").write_text(repr(e))

    return str(out_dir)
