"""Streaming block latency benchmark (p50) for the causal v2 model.

The realtime budget for a 2048-sample block @ 44.1 kHz is 46.4 ms; the
reference claims realtime on laptop CPUs (BASELINE.md). Here the chain of
N sequential streaming steps (cache carried through lax.scan — genuinely
sequential, no pipelining possible) is timed on-device and divided by N,
so the remote-dispatch overhead of this environment cancels out.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def main(blocks: int = 64):
    from rave_tpu.config import compose
    from rave_tpu.factory import build_rave

    cfg = compose(["v2", "causal"])
    model = build_rave(cfg, n_channels=1, train=False, stream_batch=1)
    block = cfg.block_size()
    x0 = jnp.zeros((1, block, 1), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x0
    )
    cache = variables["cache"]
    rest = {k: v for k, v in variables.items() if k != "cache"}

    def make_run(n):
        @jax.jit
        def run(cache, seed):
            def body(carry, i):
                c = carry
                k = jax.random.fold_in(seed, i)
                xb = jax.random.normal(k, (1, block, 1), jnp.float32) * 0.1
                z, upd = model.apply(
                    {**rest, "cache": c}, xb, method="step_encode",
                    mutable=["cache"], rngs={"noise": k},
                )
                y, upd2 = model.apply(
                    {**rest, "cache": upd["cache"]},
                    z[..., : cfg.latent_size],
                    method="step_decode", mutable=["cache"], rngs={"noise": k},
                )
                return upd2["cache"], jnp.sum(y)

            c, ys = jax.lax.scan(body, cache, jnp.arange(n))
            return jnp.sum(ys)

        return run

    def timed(n, seed):
        run = make_run(n)
        float(run(cache, jax.random.key(seed)))
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            float(run(cache, jax.random.key(seed + r + 1)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1, 1)
    tN = timed(blocks, 2)
    per_block = (tN - t1) / (blocks - 1)
    budget = block / cfg.sampling_rate
    print(
        f"causal v2 streaming: {per_block*1000:.2f} ms/block "
        f"(budget {budget*1000:.1f} ms, {budget/per_block:.1f}x realtime headroom)"
    )


if __name__ == "__main__":
    main()
