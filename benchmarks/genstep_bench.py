"""Decompose the v2 adversarial generator step (71 ms, 13.7% MFU).

Times each constituent fwd+bwd at the training geometry so the next
optimization target is data, not guesswork:
  model    autoencoder fwd+bwd (dummy L2 target)
  dist     spectral distances fwd+bwd (multiband + fullband, 5 scales)
  critic   discriminator fwd + bwd-to-input (the gen step's critic cost)

Usage: python benchmarks/genstep_bench.py [bf16] [stft=matmul] [parts]
  parts — additionally split the v2 critic into its MPD and MSD stacks
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp

from benchmarks.critic_bench import bench  # reuse roofline printer


def main(args):
    if any(a.startswith("stft=") for a in args):
        os.environ["RAVE_TPU_STFT"] = [a.split("=")[1] for a in args if a.startswith("stft=")][0]

    from rave_tpu.config import compose
    from rave_tpu.factory import build_audio_distance, build_discriminator, build_rave

    overrides = ["train.bf16=true"] if "bf16" in args else []
    cfg = compose(["v2"], overrides)
    B, T = 8, 131072
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    distance = build_audio_distance(cfg)

    x = jax.random.normal(jax.random.key(1), (B, T, 1)) * 0.1
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(2)}, x
    )
    mstate = {k: v for k, v in variables.items() if k not in ("params", "cache")}
    params = variables["params"]
    dvars = jax.jit(dis.init)(jax.random.key(3), jnp.concatenate([x, x], 0))
    dparams = dvars["params"]

    # ---- model fwd+bwd ---------------------------------------------------
    def model_loss(p, xi):
        y = model.apply(
            {"params": p, **mstate}, xi, rngs={"noise": jax.random.key(4)}
        )
        return jnp.sum((y - xi) ** 2)

    def model_fb(p, xi):
        l, g = jax.value_and_grad(model_loss)(p, xi)
        return l + sum(jnp.sum(jnp.abs(t)) for t in jax.tree_util.tree_leaves(g))

    bench("model fwd+bwd", model_fb, params, x)

    # ---- distances fwd+bwd ----------------------------------------------
    y0 = jax.jit(
        lambda p, xi: model.apply(
            {"params": p, **mstate}, xi, rngs={"noise": jax.random.key(4)}
        )
    )(params, x)

    def dist_loss(yi, xi):
        tot = 0.0
        for v in distance(xi, yi).values():
            tot = tot + v
        return tot

    def dist_fb(yi, xi):
        l, g = jax.value_and_grad(dist_loss)(yi, xi)
        return l + jnp.sum(jnp.abs(g))

    bench("distances fwd+bwd", dist_fb, y0, x)

    # ---- critic fwd + bwd-to-input (gen-step view) -----------------------
    def critic_loss(yi):
        xy = jnp.concatenate([x, yi], axis=0)
        feats = dis.apply({"params": dparams}, xy)
        return sum(
            jnp.sum(t.astype(jnp.float32) ** 2)
            for t in jax.tree_util.tree_leaves(feats)
        )

    def critic_fb(yi):
        l, g = jax.value_and_grad(critic_loss)(yi)
        return l + jnp.sum(jnp.abs(g))

    bench("critic fwd+bwd-to-input", critic_fb, y0)

    # ---- v2 critic split: MPD vs MSD (gen-step view) ----------------------
    if "parts" in args:
        from rave_tpu.models.discriminators import (
            MultiPeriodDiscriminator,
            MultiScaleDiscriminator,
        )

        d = cfg.discriminator
        subs = {
            "MPD(2,3,5,7,11)": MultiPeriodDiscriminator(
                periods=d.periods, capacity=d.capacity or cfg.capacity,
                n_layers=d.n_layers, kernel_size=d.period_kernel, stride=d.stride,
            ),
            "MSD(3 scales)": MultiScaleDiscriminator(
                n_discriminators=d.n_scales, capacity=d.capacity or cfg.capacity,
                n_layers=d.n_layers, kernel_size=d.kernel_size, stride=d.stride,
            ),
        }
        xy0 = jnp.concatenate([x, y0], axis=0)
        for label, sub in subs.items():
            p = jax.jit(sub.init)(jax.random.key(5), xy0)["params"]

            def sub_fb(yi, p=p, sub=sub):
                def loss(yj):
                    xy = jnp.concatenate([x, yj], axis=0)
                    feats = sub.apply({"params": p}, xy)
                    return sum(
                        jnp.sum(t.astype(jnp.float32) ** 2)
                        for t in jax.tree_util.tree_leaves(feats)
                    )

                l, g = jax.value_and_grad(loss)(yi)
                return l + jnp.sum(jnp.abs(g))

            bench(label, sub_fb, y0)


if __name__ == "__main__":
    main(sys.argv[1:])
