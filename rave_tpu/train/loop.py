"""The training driver (the Lightning Trainer equivalent).

Orchestrates: channel inference, dataset split + per-host loaders, model
construction, receptive-field measurement, per-phase compiled steps,
validation (+ PCA buffers), EMA, checkpointing, logging.

Reference flow: scripts/train.py:134-268 + rave/model.py callbacks.
"""
from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu import config as config_lib
from rave_tpu.config import RaveConfig
from rave_tpu.data.dataset import get_dataset, split_dataset
from rave_tpu.data.loader import Loader
from rave_tpu.data.store import get_training_channels
from rave_tpu.factory import build_audio_distance, build_discriminator, build_rave
from rave_tpu.parallel.mesh import (
    all_processes_min,
    data_mesh,
    gather_to_hosts,
    put_batch,
    replicate,
)
from rave_tpu.train.analysis import pca, receptive_field
from rave_tpu.train.state import create_train_state
from rave_tpu.train.steps import build_train_steps, pick_phase
from rave_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from rave_tpu.utils.logging import MetricsLogger


def make_run_dir(root: str, name: str, cfg: RaveConfig, write: bool = True) -> Path:
    run_name = f"{name}_{config_lib.config_hash(cfg)}"
    run_dir = Path(root) / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    if write:  # host 0 only under multi-host (identical content anyway)
        (run_dir / "config.json").write_text(config_lib.snapshot(cfg))
    return run_dir


class _NullLogger:
    """No-op MetricsLogger for non-zero hosts."""

    def log(self, *a, **k):
        pass

    log_text = log_audio = update_status = log


def dataset_is_lazy(db_path: str) -> bool:
    from rave_tpu.data.store import read_metadata

    try:
        return bool(read_metadata(db_path).get("lazy", False))
    except Exception:
        return True


def train(
    cfg: RaveConfig,
    db_path: str,
    name: str = "run",
    out_path: str = "runs",
    n_channels: Optional[int] = None,
    max_steps: Optional[int] = None,
    val_every: int = 10000,
    save_every: Optional[int] = None,
    smoke_test: bool = False,
    seed: int = 0,
    resume: bool = True,
    progress: bool = True,
    trace_steps: int = 0,
    device_data: str = "auto",
):
    jax.devices()  # initialize the TPU backend before anything imports torch
    is_main = jax.process_index() == 0
    progress = progress and is_main
    channels = get_training_channels(db_path, n_channels)
    cfg.data.n_channels = channels  # recorded in the config snapshot
    run_dir = make_run_dir(out_path, name, cfg, write=is_main)
    # host 0 owns the metrics/checkpoint side channels; other hosts log to
    # JSONL only (multi-host runs usually share run_dir over NFS)
    logger = MetricsLogger(str(run_dir)) if is_main else _NullLogger()

    dataset = get_dataset(
        db_path,
        cfg.sampling_rate,
        cfg.data.n_signal,
        derivative=cfg.data.derivative,
        normalize=cfg.data.normalize,
        rand_pitch=cfg.data.rand_pitch,
        augmentations=cfg.data.augmentations,
    )
    train_idx, val_idx = split_dataset(dataset)
    host_id, host_count = jax.process_index(), jax.process_count()
    train_loader = None
    standard_pipeline = not (
        cfg.data.augmentations
        or cfg.data.derivative
        or cfg.data.normalize
        or cfg.data.rand_pitch
    )
    # device-resident dataset: whole int16 store in HBM, batches made
    # on-chip (zero steady-state host->device transfer). Standard pipeline
    # + single process + fits the budget (data/device_data.py).
    use_device_data = False
    if (
        device_data != "off"
        and standard_pipeline
        and host_count == 1
        and not str(db_path).startswith("http")
        and not dataset_is_lazy(db_path)
    ):
        from rave_tpu.data.device_data import db_nbytes

        budget = float(os.environ.get("RAVE_TPU_DEVICE_DATA_MAX_GB", "4")) * 1e9
        use_device_data = device_data == "on" or db_nbytes(db_path) <= budget
    if not use_device_data and standard_pipeline and not str(db_path).startswith("http"):
        # standard pipeline -> threaded C++ sampler (crop/dither/mangle)
        try:
            from rave_tpu.data.loader import NativeLoader

            train_loader = NativeLoader(
                db_path, train_idx, cfg.data.batch, cfg.data.n_signal,
                cfg.sampling_rate, seed=seed,
                host_id=host_id, host_count=host_count,
            )
            if progress:
                print("using native (C++) input pipeline")
        except Exception:
            train_loader = None
    if train_loader is None and not use_device_data:
        train_loader = Loader(
            dataset, train_idx, cfg.data.batch, seed=seed,
            workers=cfg.data.workers,
            host_id=host_id, host_count=host_count,
        )
    val_loader = Loader(
        dataset, val_idx, cfg.data.batch, seed=seed, shuffle=False,
        host_id=host_id, host_count=host_count, drop_last=False,
    )

    model = build_rave(cfg, n_channels=channels, train=True)
    model_eval = build_rave(cfg, n_channels=channels, train=False)
    discriminator = build_discriminator(cfg, n_channels=channels)
    distance = build_audio_distance(cfg)

    # config + model repr to TB/text at fit start (reference
    # rave/model.py:497-510 on_fit_start)
    logger.log_text("config", config_lib.snapshot(cfg))
    logger.log_text("model", f"{model}\n\n{discriminator}")

    # receptive field (static -> bakes the valid-signal crop into the jit)
    crop_frames = (0, 0)
    rf = (0, 0)
    if cfg.train.valid_signal_crop:
        t0 = time.time()
        rf = receptive_field(cfg, n_channels=channels)
        dim = cfg.n_band * channels if cfg.input_mode == "pqmf" else channels
        crop_frames = (rf[0] // max(dim, 1), rf[1] // max(dim, 1))
        total_frames = (cfg.data.n_signal * channels) // max(dim, 1)
        if crop_frames[0] + crop_frames[1] >= total_frames:
            raise ValueError(
                f"n_signal={cfg.data.n_signal} leaves no valid signal after "
                f"cropping the model's receptive field "
                f"({rf[0]}+{rf[1]} samples) — raise --n_signal or disable "
                f"train.valid_signal_crop"
            )
        if progress:
            ms = 1000 / cfg.sampling_rate
            print(
                f"receptive field: {rf[0]*ms:.1f}ms <- x -> {rf[1]*ms:.1f}ms "
                f"({time.time()-t0:.0f}s)"
            )

    state = create_train_state(
        cfg, model, discriminator, jax.random.key(seed), n_channels=channels
    )
    if resume:
        restored = restore_checkpoint(str(run_dir), state)
        if restored is not None:
            state = restored
            if progress:
                print(f"resumed at step {int(state.step)}")
    state = state.replace(
        model_state={
            **state.model_state,
            "buffers": {
                **state.model_state.get("buffers", {}),
                "receptive_field": jnp.asarray(rf, jnp.float32),
            },
        }
    )

    mesh = data_mesh()
    state = replicate(mesh, state)

    steps = build_train_steps(cfg, model, discriminator, crop_frames=crop_frames)

    # ---- jitted validation ----------------------------------------------
    @jax.jit
    def val_step(gen_params, model_state, x, rng):
        variables = {"params": gen_params, **model_state}

        def run(mdl):
            x_enc = mdl.transform_input(x)
            z = mdl.encoder(x_enc)
            if cfg.latent.family == "variational":
                mean = jnp.split(z, 2, axis=-1)[0]
            else:
                mean = z
            zs, _ = mdl.reparametrize(z)
            y = mdl.decode(zs)
            d = distance(x, y[:, : x.shape[1], :])
            return sum(d.values()), mean, y

        return model_eval.apply(variables, rngs={"noise": rng}, method=run)

    max_steps = max_steps or cfg.train.max_steps
    if smoke_test:
        max_steps = min(max_steps, int(state.step) + 2)
        val_every = 1

    rng0 = jax.random.key(seed + 1)
    step = int(state.step)
    best_val = float("inf")
    saved_at = -1
    eval_number = 0
    t_last, s_last = time.time(), step

    def device_prefetch(it, depth: int = 2):
        """Overlap host->device transfer with the running step
        (device_put is async; the deque keeps `depth` batches in flight).
        Under multi-process DP each host contributes its local shard to a
        globally-sharded batch (parallel/mesh.py put_batch)."""
        import collections

        q = collections.deque()
        for x in it:
            q.append(put_batch(mesh, x))
            if len(q) >= depth:
                yield q.popleft()
        while q:
            yield q.popleft()

    # optional jax.profiler trace window (the Lightning profiler="simple"
    # analog, SURVEY.md §5); view with TensorBoard or xprof
    trace_start = step + 3 if trace_steps else -1
    tracing = False

    if use_device_data:
        from rave_tpu.data.device_data import DeviceDataPipeline

        pipeline = DeviceDataPipeline(
            db_path, train_idx, cfg.data.batch, cfg.data.n_signal,
            cfg.sampling_rate, seed=seed, mesh=mesh,
        )
        if progress:
            from rave_tpu.data.device_data import db_nbytes

            print(
                f"using device-resident dataset "
                f"({db_nbytes(db_path)/1e9:.2f} GB int16 in HBM, "
                "batches assembled on-chip)"
            )
        # resume-safe: the on-chip pipeline is deterministic in the step
        # counter, so a resumed run continues the same sample schedule;
        # keep two batches dispatched ahead so assembly overlaps the step
        def device_data_iter(start: int, depth: int = 2):
            import collections

            q = collections.deque()
            s = start
            while True:
                while len(q) < depth:
                    q.append(pipeline.batch_at(s))
                    s += 1
                yield q.popleft()

        data_iter = device_data_iter(step)
    else:
        data_iter = device_prefetch(train_loader.forever())
    while step < max_steps:
        if trace_steps:
            if step == trace_start and not tracing:
                jax.profiler.start_trace(str(run_dir / "trace"))
                tracing = True
            elif tracing and step >= trace_start + trace_steps:
                jax.profiler.stop_trace()
                tracing = False
                if progress:
                    print(f"profiler trace written to {run_dir}/trace")
        xb = next(data_iter)
        which, warmed, quantize = pick_phase(cfg, step)
        rng = jax.random.fold_in(rng0, step)
        if which == "gen":
            state, metrics = steps["gen"](state, xb, rng, warmed=warmed, quantize=quantize)
        else:
            state, metrics = steps["dis"](state, xb, rng, quantize=quantize)
        step += 1

        if step % 100 == 0 or step <= 2:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_last
            m["steps_per_sec"] = (step - s_last) / max(dt, 1e-9)
            t_last, s_last = time.time(), step
            logger.log(step, m)
            logger.update_status(step=step, warmed=bool(warmed))
            if progress:
                print(
                    f"step {step} [{which}] loss_gen={m.get('loss_gen', 0):.3f} "
                    f"loss_dis={m.get('loss_dis', 0):.3f} "
                    f"({m['steps_per_sec']:.2f} it/s)",
                    flush=True,
                )

        if step % val_every == 0 or step == max_steps:
            val_loss, latents, audio = run_validation(
                cfg, state, val_loader, val_step, logger, step, eval_number,
                warmed, max_batches=2 if smoke_test else None, mesh=mesh,
            )
            eval_number += 1
            # update PCA buffers BEFORE any same-step checkpoint save, so
            # the saved/exported model carries *this* val period's PCA
            # (pre-warmup, variational only; reference rave/model.py:463-488)
            if latents is not None and not warmed and cfg.latent.family == "variational":
                comp, mean, fid = pca(latents)
                bufs = dict(state.model_state.get("buffers", {}))
                bufs.update(
                    latent_pca=jnp.asarray(comp),
                    latent_mean=jnp.asarray(mean),
                    fidelity=jnp.asarray(fid),
                )
                state = state.replace(
                    model_state={**state.model_state, "buffers": bufs}
                )
                for p in (0.8, 0.9, 0.95, 0.99):
                    logger.log(step, {f"fidelity_{p}": float(np.argmax(fid > p))})
            if quantize and "codebook" in state.model_state:
                # RVQ health at scale (reference rave/quantization.py:111-126
                # keeps these EMA stats; logging them answers the "do codes
                # stay alive over 100k steps" question): per-run mean
                # perplexity + fraction of codes carrying real mass
                perp, usage = codebook_health(state.model_state["codebook"])
                logger.log(step, {
                    "codebook_perplexity": perp, "codebook_usage": usage,
                })
            if val_loss is not None and val_loss <= best_val:
                # val_loss is computed on the global batch, so every host
                # reaches the same decision; host 0 writes
                best_val = val_loss
                if is_main:
                    save_checkpoint(str(run_dir), step, jax.device_get(state))
                saved_at = step
        # periodic snapshots run on their own cadence, independent of
        # val_every (reference step-period ModelCheckpoint, rave/core.py:538-549)
        if save_every and step % save_every == 0 and saved_at != step:
            if is_main:
                save_checkpoint(str(run_dir), step, jax.device_get(state))
            saved_at = step

    if tracing:  # window outlived the run — still flush the trace
        jax.profiler.stop_trace()
        if progress:
            print(f"profiler trace written to {run_dir}/trace")
    if saved_at != step and is_main:
        save_checkpoint(str(run_dir), step, jax.device_get(state))
    return str(run_dir)


def codebook_health(codebook_state) -> tuple:
    """(mean perplexity, mean live-code fraction) over every quantizer's
    EMA cluster_size in the 'codebook' collection. Host-side, val-rate."""
    perps, usages = [], []
    for path, leaf in jax.tree_util.tree_flatten_with_path(codebook_state)[0]:
        if "cluster_size" not in jax.tree_util.keystr(path):
            continue
        cs = np.asarray(jax.device_get(leaf)).reshape(-1)
        total = float(cs.sum())
        if total <= 0:
            continue
        p = cs / total
        ent = float(-(p * np.log(np.maximum(p, 1e-12))).sum())
        perps.append(float(np.exp(ent)))
        # EMA mass >= half a uniform share counts as a live code
        usages.append(float((cs > 0.5 * total / cs.size).mean()))
    if not perps:
        return 0.0, 0.0
    return float(np.mean(perps)), float(np.mean(usages))


def run_validation(
    cfg, state, val_loader, val_step, logger, step, eval_number, warmed,
    max_batches: Optional[int] = None, mesh=None,
):
    """Full validation epoch (reference rave/model.py:426-495 validates every
    val batch and logs 8 audio clips). `max_batches` exists only for smoke
    runs; production uses the whole val split.

    Multi-process: hosts iterate the same number of batches (their per-host
    shards combined into global batches), so the jitted val step's
    collectives stay in lockstep and the returned loss is identical on
    every host (consistent best-val decisions)."""
    losses, latents, audios = [], [], []
    rng = jax.random.key(1234)
    n_clips = 0
    multiprocess = jax.process_count() > 1
    if multiprocess:
        # full batches only: global assembly needs equal-sized local shards
        n_common = all_processes_min(len(val_loader.indices) // val_loader.batch)
    else:
        n_common = len(val_loader)
    if max_batches is not None:
        n_common = min(n_common, max_batches)
    # validate with the EMA shadow when enabled (reference EMA callback
    # swaps weights for validation, scripts/train.py:88-120)
    params = state.ema_params if state.ema_params is not None else state.gen_params
    for b, x in enumerate(val_loader.epoch(0)):
        if b >= n_common:
            break
        xb = put_batch(mesh, x) if multiprocess else jnp.asarray(x)
        loss, mean, y = val_step(params, state.model_state, xb, rng)
        losses.append(float(loss))
        latents.append(gather_to_hosts(mean))
        if n_clips < 8:
            audios.append((gather_to_hosts(xb), gather_to_hosts(y)))
            n_clips += audios[-1][0].shape[0]
    if not losses:
        return None, None, None
    val = float(np.mean(losses))
    logger.log(step, {"validation": val})
    if audios:
        xy = np.concatenate(
            [np.concatenate([a[0], a[1][:, : a[0].shape[1]]], axis=1) for a in audios],
            axis=0,
        )
        wav = xy[:8, :, 0].reshape(-1)
        if cfg.data.derivative:
            # derivative-trained models produce derivative-domain audio;
            # integrate back before logging (reference rave/model.py:491-492,
            # scripts/train.py:160-161)
            from rave_tpu.data.transforms import get_derivator_integrator

            wav = get_derivator_integrator(cfg.sampling_rate)[1](wav)
        logger.log_audio(
            "audio_val", wav, cfg.sampling_rate, eval_number
        )
    z = np.concatenate([l.reshape(-1, l.shape[-1]) for l in latents], 0)
    return val, z, audios
