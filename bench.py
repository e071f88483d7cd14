"""Benchmark: v2 encode+decode realtime factor on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference paper's ~20x realtime claim on laptop CPU
(BASELINE.md north star: >= 20x realtime per chip @ 44.1 kHz).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from rave_tpu.config import compose
    from rave_tpu.factory import build_rave

    cfg = compose(["v2"])
    model = build_rave(cfg, n_channels=1, train=False)

    batch, n_signal = 4, 131072
    x = jnp.zeros((batch, n_signal, 1), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )
    variables = {k: v for k, v in variables.items() if k != "cache"}

    @jax.jit
    def forward(params, x, rng):
        return model.apply(
            {**variables, "params": params}, x, rngs={"noise": rng}
        )

    params = variables["params"]
    # distinct inputs per iteration + a chained reduction so no layer of
    # the stack can memoize or overlap executions away
    iters = 20
    xs = jax.random.normal(
        jax.random.key(3), (iters, batch, n_signal, 1), jnp.float32
    ) * 0.1
    rngs = jax.random.split(jax.random.key(2), iters)

    # warmup / compile
    acc = jnp.sum(forward(params, xs[0], rngs[0]))
    jax.block_until_ready(acc)

    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(iters):
        acc = acc + jnp.sum(forward(params, xs[i], rngs[i]))
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * n_signal / cfg.sampling_rate
    xrt = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "v2_encode_decode_realtime_factor",
                "value": round(xrt, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(xrt / 20.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
