"""The two-phase adversarial training step, compiled per phase.

Re-design of the reference's manual-optimization training_step
(rave/model.py:288-424). Instead of Python-side branching inside one
graph, each (phase, role) combination compiles to its own XLA program:

  * gen/pre-warmup   — reconstruction + regularization only (no critic)
  * gen/adversarial  — + feature matching + adversarial terms
  * dis              — critic hinge/ls/ns loss (generator run without grads)

Host code picks the program per step (`pick_phase`); all schedules that
stay continuous (beta, lr) are jnp functions of the replicated step
counter, so there is no recompilation during a phase.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rave_tpu.config import RaveConfig
from rave_tpu.factory import build_audio_distance, build_gan_loss
from rave_tpu.ops.dsp import mean_difference
from rave_tpu.train.schedules import (
    beta_factor,
    gen_lr_schedule,
    quantize_enabled,
    warmed_up,
)
from rave_tpu.train.state import RaveTrainState, make_optimizers


def _autoencode(
    cfg: RaveConfig, model, variables, x, rng, warmed: bool, quantize: bool,
    train: bool,
):
    """Full autoencoding pass; returns (out, new_model_state).

    With cfg.train.bf16 the model compute runs in bfloat16 (weights are cast
    per-op from the fp32 masters) while loss targets and outputs are fp32.
    """
    mutable = [k for k in variables if k != "params"] if train else False
    bf16 = cfg.train.bf16

    def run(mdl):
        x_model = x.astype(jnp.bfloat16) if bf16 else x
        x_enc = mdl.transform_input(x_model)
        z = mdl.encoder(x_enc, warmed_up=warmed)
        z = z.astype(jnp.float32)
        rkw = {}
        if cfg.latent.family == "discrete":
            rkw = dict(enabled=quantize, train=train)
        zs, reg = mdl.reparametrize(z, **rkw)
        if bf16:
            zs = zs.astype(jnp.bfloat16)
        y_mb = mdl.decode_multiband(zs, warmed_up=warmed).astype(jnp.float32)
        y_raw = mdl.synthesize(y_mb)
        y_raw = y_raw[:, : x.shape[1], :]
        if cfg.output_mode == "pqmf":
            y_bands = y_mb
        else:
            y_bands = mdl.multiband(y_raw)
        if cfg.input_mode == "pqmf" and not bf16:
            x_bands = x_enc
        else:
            # loss targets always in fp32 (multiband of the raw waveform)
            x_bands = mdl.multiband(x)
        y_bands = y_bands[:, : x_bands.shape[1], :]
        return {
            "x_bands": x_bands.astype(jnp.float32),
            "y_bands": y_bands,
            "y_raw": y_raw,
            "reg": reg.astype(jnp.float32),
        }

    out = model.apply(
        variables,
        rngs={"noise": rng},
        method=run,
        mutable=mutable,
    )
    if train:
        return out
    return out, {}


def _crop(cfg: RaveConfig, arr, crop: Tuple[int, int]):
    l, r = crop
    if l:
        arr = arr[:, l:, :]
    if r:
        arr = arr[:, :-r, :]
    return arr


def _split_features(features):
    """Real/fake split of concatenated critic features
    (reference rave/model.py:276-286)."""
    real, fake = [], []
    for scale in features:
        r_s, f_s = [], []
        for f in scale:
            r, f2 = jnp.split(f, 2, axis=0)
            r_s.append(r)
            f_s.append(f2)
        real.append(r_s)
        fake.append(f_s)
    return real, fake


def build_train_steps(
    cfg: RaveConfig,
    model,
    discriminator,
    crop_frames: Tuple[int, int] = (0, 0),
):
    """Returns dict with jitted 'gen' (per warmed/quantize) and 'dis' steps."""
    distance = build_audio_distance(cfg)
    gan_loss = build_gan_loss(cfg)
    gen_tx, dis_tx = make_optimizers(cfg)
    t = cfg.train
    weights = dict(t.weights)
    # LinearLR on the *global* step (reference rave/model.py:272-274 steps
    # the scheduler every batch, discriminator batches included)
    gen_lr = gen_lr_schedule(t.gen_lr, t.lr_end_factor, t.phase_1_duration)

    def losses_and_metrics(out, dis_params, x, warmed: bool, step, gen_metrics=True):
        """gen_metrics=False (dis step default) skips the reconstruction
        distances — they never feed the critic loss, and the 4 multiscale
        STFT stacks are pure logging cost there (train.dis_full_metrics)."""
        metrics = {}
        loss_gen = {}
        if gen_metrics:
            x_b = _crop(cfg, out["x_bands"], crop_frames if t.valid_signal_crop else (0, 0))
            y_b = _crop(cfg, out["y_bands"], crop_frames if t.valid_signal_crop else (0, 0))
            mb = distance(x_b, y_b)
            for k, v in mb.items():
                loss_gen[f"multiband_{k}"] = weights.get("multiband_audio_distance", 1.0) * v
            fb = distance(x, out["y_raw"])
            for k, v in fb.items():
                loss_gen[f"fullband_{k}"] = weights.get("audio_distance", 1.0) * v

            beta = beta_factor(
                step, t.beta_initial, t.beta_target, t.beta_warmup_len, t.beta_log_warmup
            )
            loss_gen["regularization"] = out["reg"] * beta
            metrics["beta_factor"] = beta
            metrics["regularization_raw"] = out["reg"]

        loss_dis = jnp.asarray(0.0)
        if warmed:
            xy = jnp.concatenate([x, out["y_raw"]], axis=0)
            if t.bf16_dis:
                # critic compute in bf16 (weights cast per-op, nn/conv.py);
                # upcast features at the loss boundary — the converts fuse
                # into the loss elementwise ops, so HBM traffic stays bf16
                xy = xy.astype(jnp.bfloat16)
            features = discriminator.apply({"params": dis_params}, xy)
            if t.bf16_dis:
                features = jax.tree_util.tree_map(
                    lambda f: f.astype(jnp.float32), features
                )
            feat_real, feat_fake = _split_features(features)
            fm_total = 0.0
            adv_total = 0.0
            dis_total = 0.0
            pred_real = 0.0
            pred_fake = 0.0
            for sr, sf in zip(feat_real, feat_fake):
                pairs = list(zip(sr[t.num_skipped_features :], sf[t.num_skipped_features :]))
                fm = sum(
                    mean_difference(a, b, norm="L1", relative=t.feature_matching_relative)
                    for a, b in pairs
                ) / max(len(pairs), 1)
                fm_total = fm_total + fm
                d, a = gan_loss(sr[-1], sf[-1])
                dis_total = dis_total + d
                adv_total = adv_total + a
                pred_real = pred_real + jnp.mean(sr[-1])
                pred_fake = pred_fake + jnp.mean(sf[-1])
            fm_total = fm_total / len(feat_real)
            # NOTE: the reference multiplies the feature-matching weight in
            # twice (insert at rave/model.py:397 and again in the weighted
            # sum at :411) — replicated for loss-balance parity.
            loss_gen["feature_matching"] = weights.get("feature_matching", 20.0) * fm_total
            loss_gen["adversarial"] = weights.get("adversarial", 1.0) * adv_total
            loss_dis = dis_total
            metrics["pred_real"] = pred_real
            metrics["pred_fake"] = pred_fake

        total_gen = 0.0
        for k, v in loss_gen.items():
            total_gen = total_gen + v * weights.get(k, 1.0)
            metrics[k] = v
        if gen_metrics:
            metrics["loss_gen"] = total_gen
        metrics["loss_dis"] = loss_dis
        return total_gen, loss_dis, metrics

    # ---- generator step --------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("warmed", "quantize"), donate_argnums=0)
    def gen_step(state: RaveTrainState, x, rng, warmed: bool, quantize: bool):
        def autoencode(gen_params):
            variables = {"params": gen_params, **state.model_state}
            return _autoencode(
                cfg, model, variables, x, rng, warmed, quantize, train=True
            )

        if t.remat:
            autoencode = jax.checkpoint(autoencode)

        def loss_fn(gen_params):
            out, new_ms = autoencode(gen_params)
            total_gen, _, metrics = losses_and_metrics(
                out, state.dis_params, x, warmed, state.step
            )
            return total_gen, (new_ms, metrics)

        (loss, (new_ms, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.gen_params)
        updates, new_opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
        lr = gen_lr(state.step)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.gen_params, updates)
        metrics["gen_lr"] = lr
        model_state = {**state.model_state, **new_ms}
        ema = state.ema_params
        if ema is not None:
            d = t.ema
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1 - d), ema, new_params
            )
        return (
            state.replace(
                step=state.step + 1,
                gen_params=new_params,
                gen_opt=new_opt,
                model_state=model_state,
                ema_params=ema,
            ),
            metrics,
        )

    # ---- discriminator step ---------------------------------------------
    @functools.partial(jax.jit, static_argnames=("quantize",), donate_argnums=0)
    def dis_step(state: RaveTrainState, x, rng, quantize: bool):
        variables = {"params": state.gen_params, **state.model_state}
        out, new_ms = _autoencode(
            cfg, model, variables, x, rng, True, quantize, train=True
        )
        out = jax.lax.stop_gradient(out)

        def loss_fn(dis_params):
            _, loss_dis, metrics = losses_and_metrics(
                out, dis_params, x, True, state.step,
                gen_metrics=t.dis_full_metrics,
            )
            return loss_dis, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.dis_params
        )
        updates, new_opt = dis_tx.update(grads, state.dis_opt, state.dis_params)
        new_params = optax.apply_updates(state.dis_params, updates)
        return (
            state.replace(
                step=state.step + 1,
                dis_params=new_params,
                dis_opt=new_opt,
                model_state={**state.model_state, **new_ms},
            ),
            metrics,
        )

    return {"gen": gen_step, "dis": dis_step}


def pick_phase(cfg: RaveConfig, step: int) -> Tuple[str, bool, bool]:
    """(which, warmed, quantize) for this step — host-side, static.

    Mirrors rave/model.py:401-413: every `update_discriminator_every`-th
    step after warmup trains the critic, all others the generator.
    """
    w = warmed_up(step, cfg.train.phase_1_duration)
    q = quantize_enabled(step, cfg.train.warmup_quantize)
    if w and step % cfg.train.update_discriminator_every == 0:
        return "dis", w, q
    return "gen", w, q
