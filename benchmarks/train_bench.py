"""Training throughput benchmark: full-size v2, one chip.

Reports steps/sec for each compiled phase (gen pre-warmup, gen adversarial,
discriminator) at the reference's data geometry (batch 8 x 131072 samples),
fp32 and bf16-compute variants. Not the driver metric (bench.py is);
results recorded in BENCH_NOTES.md.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_steps(cfg_overrides, label, batch=8, n_signal=131072, iters=6,
                presets=("v2",)):
    from rave_tpu.config import compose
    from rave_tpu.factory import build_discriminator, build_rave
    from rave_tpu.train import build_train_steps, create_train_state

    cfg = compose(list(presets), cfg_overrides)
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=n_signal)
    steps = build_train_steps(cfg, model, dis, crop_frames=(4, 4))
    x = jax.random.normal(jax.random.key(1), (batch, n_signal, 1)) * 0.1

    def run_phase(name, fn, *args, **kw):
        nonlocal state
        state, m = fn(state, x, jax.random.key(2), **kw)
        float(m.get("loss_gen", m.get("loss_dis")))  # sync through host fetch
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = fn(state, x + i * 1e-4, jax.random.fold_in(jax.random.key(3), i), **kw)
        float(m.get("loss_gen", m.get("loss_dis")))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label} {name}: {dt*1000:.0f} ms/step ({1/dt:.2f} it/s)", flush=True)

    run_phase("gen/prewarm", steps["gen"], warmed=False, quantize=False)
    run_phase("gen/adv", steps["gen"], warmed=True, quantize=False)
    run_phase("dis", steps["dis"], quantize=False)


if __name__ == "__main__":
    which = sys.argv[1:] or ["fp32", "bf16"]
    variants = {
        "fp32": ([], ("v2",)),
        "bf16": (["train.bf16=true"], ("v2",)),
        "bf16_dis": (["train.bf16_dis=true"], ("v2",)),
        "bf16_all": (["train.bf16=true", "train.bf16_dis=true"], ("v2",)),
        "v3": ([], ("v3",)),
        "v3_bf16_all": (
            ["train.bf16=true", "train.bf16_dis=true"], ("v3",)
        ),
        # A/B of the dis-step metric trim (the default skips the 4
        # metric-only STFT stacks; this restores them)
        "fullmetrics": (["train.dis_full_metrics=true"], ("v2",)),
        "v3_fullmetrics": (["train.dis_full_metrics=true"], ("v3",)),
    }
    for name in which:
        ov, presets = variants[name]
        timed_steps(ov, name, presets=presets)
