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


def load_run(run: str, use_ema: bool = False, step=None):
    """(cfg, gen_params, model_state, n_channels) from a run directory
    (newest checkpoint, or the one at exactly `step`)."""
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
    state = restore_checkpoint(run_dir, template, step)
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
    # union of every method's streaming state, so AOT modules can thread
    # state_in -> state_out with a fixed pytree structure
    from rave_tpu.export.artifact import full_stream_cache

    cache = full_stream_cache(model, cfg, stream_batch, block, n_channels)

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
        prior_params = restored["params"]
        (out_dir / "prior.json").write_text(json.dumps(pcfg, indent=2))
        (out_dir / "prior_params.msgpack").write_bytes(
            flax.serialization.to_bytes(prior_params)
        )
        manifest_prior = dict(pcfg)
    else:
        manifest_prior = None
        prior_params = None


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
        # trained on the signal derivative -> consumers must integrate the
        # output back (reference scripts/train.py:160-161, dataset.py:24-29)
        "derivative": bool(cfg.data.derivative),
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
        # Named-attribute ops for Python-free hosts (the nn_tilde
        # register_attribute analog, reference scripts/export.py:306-341):
        # each attribute is a list of fills applied to every streaming-state
        # leaf whose path ends with `leaf` (see aot.<method>.state_leaves).
        # fill=None means "use the user-provided value" (a toggle);
        # constant fills implement the reset actions.
        "attribute_ops": (
            {
                "learn_target": [{"leaf": "learn_y", "fill": None}],
                "learn_source": [{"leaf": "learn_x", "fill": None}],
                "reset_target": [
                    {"leaf": "mean_y", "fill": 0.0},
                    {"leaf": "std_y", "fill": 1.0},
                    {"leaf": "num_update_y", "fill": 0.0},
                ],
                "reset_source": [
                    {"leaf": "mean_x", "fill": 0.0},
                    {"leaf": "std_x", "fill": 1.0},
                    {"leaf": "num_update_x", "fill": 0.0},
                ],
            }
            if (cfg.encoder.use_adain or cfg.decoder.use_adain)
            else {}
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

    # AOT StableHLO lowering (consumable by a C++ PJRT host without
    # Python) — the TorchScript-artifact analog: all user-facing methods.
    aot = _aot_lower(
        out_dir, cfg, model, save_vars, cache,
        latent_size=int(latent_size), stream_batch=stream_batch,
        block=block, n_channels=n_channels,
        prior_cfg=manifest_prior,
        prior_params=prior_params,
    )
    manifest["aot"] = aot
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))

    return str(out_dir)


def _aot_lower(
    out_dir: Path, cfg, model, save_vars, cache, *,
    latent_size: int, stream_batch: int, block: int, n_channels: int,
    prior_cfg=None, prior_params=None,
) -> dict:
    """AOT-lower every artifact method to StableHLO via jax.export.

    Contract for Python-free consumers (PJRT + manifest only): params and
    buffers are baked into each module as constants; the streaming state
    (conv caches + AdaIN stats when present) is an explicit first argument
    and is returned updated — feed it back each call, starting from zeros
    (shapes/dtypes are in the serialized signature and in the manifest).
    The last argument is a uint32 seed deriving all sampling randomness.

      encode_step(state, x[B,block,C], seed)  -> (z[B,frames,L], state')
      decode_step(state, z[B,frames,L], seed) -> (y[B,block,C], state')
      forward_step(state, x, seed)            -> (y, state')
      prior_step(pcache, x1[B,1,D*R], seed)   -> (next[B,1,D*R], pcache')

    The reference exposes the same surface on the TorchScript artifact
    (scripts/export.py:156-205, 586); failures are recorded per-method in
    the manifest (and as <name>_error.txt) rather than aborting export.
    """
    from jax import export as jex

    from rave_tpu.export.artifact import post_process_latent, pre_process_latent

    ratio = cfg.decimation()
    frames = block // ratio
    closed = {k: v for k, v in save_vars.items() if k not in ("cache", "adain")}
    state0 = {"cache": cache}
    mutable = ["cache"]
    if "adain" in save_vars:
        state0["adain"] = save_vars["adain"]
        mutable.append("adain")
    full_latent = int(cfg.augmented_latent_size())

    def keys(seed):
        return jax.random.split(jax.random.key(seed), 2)

    def enc_step(state, x, seed):
        r1, r2 = keys(seed)
        z, upd = model.apply(
            {**closed, **state}, x, rngs={"noise": r1},
            method="step_encode", mutable=mutable,
        )
        z = post_process_latent(cfg, model, latent_size, closed, z, r2)
        return z, {**state, **upd}

    def dec_step(state, z, seed):
        r1, r2 = keys(seed)
        zp = pre_process_latent(cfg, model, full_latent, closed, z, r2)
        y, upd = model.apply(
            {**closed, **state}, zp, rngs={"noise": r1},
            method="step_decode", mutable=mutable,
        )
        return y, {**state, **upd}

    def fwd_step(state, x, seed):
        z, state = enc_step(state, x, seed)
        return dec_step(state, z, seed + jnp.uint32(0x9E3779B9))

    x_ex = jnp.zeros((stream_batch, block, n_channels), jnp.float32)
    z_ex = jnp.zeros((stream_batch, frames, latent_size), jnp.float32)
    seed_ex = jnp.uint32(0)
    methods = {
        "encode_step": (enc_step, (state0, x_ex, seed_ex)),
        "decode_step": (dec_step, (state0, z_ex, seed_ex)),
        "forward_step": (fwd_step, (state0, x_ex, seed_ex)),
    }

    if prior_cfg is not None and prior_params is not None:
        from rave_tpu.prior.model import Prior, sample_prediction

        pr = Prior(
            latent_size=prior_cfg["latent_size"],
            resolution=prior_cfg["resolution"],
            res_size=prior_cfg["res_size"],
            skp_size=prior_cfg["skp_size"],
            kernel_size=prior_cfg["kernel_size"],
            cycle_size=prior_cfg["cycle_size"],
            n_layers=prior_cfg["n_layers"],
        )
        dr = prior_cfg["resolution"] * prior_cfg["latent_size"]
        p0 = jnp.zeros((1, 1, dr), jnp.float32)
        pv = jax.eval_shape(lambda: pr.init({"params": jax.random.key(0)}, p0))
        pcache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), pv.get("cache", {})
        )

        def prior_step(pcache, x, seed):
            logits, upd = pr.apply(
                {"params": prior_params, "cache": pcache}, x,
                method="step", mutable=["cache"],
            )
            nxt = sample_prediction(
                logits, prior_cfg["latent_size"], prior_cfg["resolution"],
                jax.random.key(seed),
            )
            return nxt, upd["cache"]

        methods["prior_step"] = (prior_step, (pcache0, p0, seed_ex))

    def leaf_paths(tree):
        """Flat '/'-joined path strings of a pytree's leaves, in the same
        order jax.jit flattens them into positional module inputs."""
        out = []
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
            parts = []
            for k in path:
                if hasattr(k, "key"):
                    parts.append(str(k.key))
                elif hasattr(k, "idx"):
                    parts.append(str(k.idx))
                else:
                    parts.append(str(k))
            out.append("/".join(parts))
        return out

    report = {}
    for name, (fn, args) in methods.items():
        try:
            exp = jex.export(jax.jit(fn))(*args)
            (out_dir / f"{name}.stablehlo").write_bytes(exp.serialize())
            # raw StableHLO bytecode + a flat I/O spec: everything a C++
            # PJRT host (native/rtpu_host.cc) needs to compile and stream
            # without Python or pytree knowledge. Inputs flatten as
            # (state..., x, seed); outputs as (y..., state') with the state
            # leaves in the same order on both sides (same dict structure).
            (out_dir / f"{name}.mlir").write_bytes(exp.mlir_module_serialized)
            n_state = len(jax.tree_util.tree_leaves(args[0]))
            n_out = len(exp.out_avals)
            report[name] = {
                "file": f"{name}.stablehlo",
                "mlir_file": f"{name}.mlir",
                "in_avals": [str(a) for a in exp.in_avals],
                "out_avals": [str(a) for a in exp.out_avals],
                "state_tree": str(jax.tree_util.tree_structure(args[0])),
                "inputs": [
                    {"shape": [int(d) for d in a.shape], "dtype": str(a.dtype)}
                    for a in exp.in_avals
                ],
                "outputs": [
                    {"shape": [int(d) for d in a.shape], "dtype": str(a.dtype)}
                    for a in exp.out_avals
                ],
                # state round trip: output[state_outputs[i]] feeds back into
                # input[state_inputs[i]] on the next call
                "n_state": n_state,
                "state_inputs": list(range(n_state)),
                "state_outputs": list(range(n_out - n_state, n_out)),
                # pytree path of each flat state leaf (index-aligned with
                # state_inputs) — lets hosts target named leaves, e.g. the
                # AdaIN attribute ops in manifest.attribute_ops
                "state_leaves": leaf_paths(args[0]),
                # indices of the flat inputs the lowered module actually
                # takes (jax.export drops args that don't affect any
                # output; state pass-through keeps them all in practice —
                # hosts must check before positional marshaling)
                "kept_inputs": [int(i) for i in exp.module_kept_var_idx],
            }
        except Exception as e:  # noqa: BLE001 — record, don't abort export
            (out_dir / f"{name}_error.txt").write_text(repr(e))
            report[name] = {"error": repr(e)[:500]}
    return report
