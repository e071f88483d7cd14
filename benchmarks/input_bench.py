"""Real-data input pipeline vs synthetic in-HBM batches (VERDICT r3 #6).

Measures, at the reference training geometry (batch 8 x 131072):
  1. host-only loader throughput — the C++ native sampler
     (crop + dither + phase mangle in native threads) and the Python
     thread-pool loader, batches/s;
  2. sustained end-to-end v2 adversarial-mix it/s feeding the compiled
     train steps from the REAL preprocessed ARS db through the same
     device_prefetch used by train/loop.py, vs the same steps fed one
     resident synthetic batch (the bench.py train_metrics methodology).

Usage: python benchmarks/input_bench.py <db_path> [steps]
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
import numpy as np


def loader_throughput(db, n=40):
    from rave_tpu.data.dataset import get_dataset, split_dataset
    from rave_tpu.data.loader import Loader, NativeLoader
    from rave_tpu.train.loop import dataset_is_lazy

    ds = get_dataset(db, 44100, 131072)
    tr, _ = split_dataset(ds)
    out = {}
    kinds = [("python", lambda: Loader(ds, tr, 8, seed=0, workers=8))]
    if not dataset_is_lazy(db):  # the C++ sampler reads raw ARS records
        kinds.insert(
            0, ("native", lambda: NativeLoader(db, tr, 8, 131072, 44100, seed=0))
        )
    for name, mk in kinds:
        it = mk().forever()
        next(it)
        t0 = time.perf_counter()
        for _ in range(n):
            next(it)
        dt = (time.perf_counter() - t0) / n
        out[name] = dt
        print(f"loader[{name}]: {dt*1000:.1f} ms/batch ({1/dt:.1f} batches/s)")
    return out


def train_throughput(db, steps=120):
    from rave_tpu.config import compose
    from rave_tpu.data.dataset import get_dataset, split_dataset
    from rave_tpu.data.loader import NativeLoader
    from rave_tpu.factory import build_discriminator, build_rave
    from rave_tpu.train import build_train_steps, create_train_state

    cfg = compose(["v2"], ["train.phase_1_duration=1"])
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=131072)
    tsteps = build_train_steps(cfg, model, dis, crop_frames=(4, 4))

    def run_mix(batch_iter, label):
        nonlocal state
        # warm both programs + burn one loop (relay upload, DEVNOTES.md)
        for i in range(10):
            x = next(batch_iter)
            which = "dis" if i % 4 == 0 else "gen"
            kw = {"warmed": True, "quantize": False} if which == "gen" else {"quantize": False}
            state, m = tsteps[which](state, x, jax.random.fold_in(jax.random.key(1), i), **kw)
        float(m.get("loss_gen", m["loss_dis"]))
        t0 = time.perf_counter()
        for i in range(steps):
            x = next(batch_iter)
            which = "dis" if i % 4 == 0 else "gen"
            kw = {"warmed": True, "quantize": False} if which == "gen" else {"quantize": False}
            state, m = tsteps[which](state, x, jax.random.fold_in(jax.random.key(2), i), **kw)
        float(m.get("loss_gen", m["loss_dis"]))
        dt = (time.perf_counter() - t0) / steps
        print(f"train mix [{label}]: {dt*1000:.1f} ms/step ({1/dt:.2f} it/s)")
        return 1 / dt

    # synthetic: one device-resident batch, varied cheaply on device
    x0 = jax.random.normal(jax.random.key(3), (8, 131072, 1)) * 0.1

    def synth_iter():
        i = 0
        while True:
            yield x0 + i * 1e-4
            i += 1

    synth = run_mix(synth_iter(), "synthetic in-HBM")

    # real: native loader + the train loop's device_prefetch
    ds = get_dataset(db, 44100, 131072)
    tr, _ = split_dataset(ds)
    loader = NativeLoader(db, tr, 8, 131072, 44100, seed=0)

    def device_prefetch(it, depth=2):
        import collections

        q = collections.deque()
        for x in it:
            q.append(jax.device_put(jnp.asarray(x)))
            if len(q) >= depth:
                yield q.popleft()
        while q:
            yield q.popleft()

    real = run_mix(device_prefetch(loader.forever()), "real ARS db")
    print(
        f"real/synthetic ratio: {real/synth*100:.1f}% "
        f"({'input-bound' if real < synth * 0.95 else 'compute-bound'})"
    )
    return {"synthetic_it_s": synth, "real_it_s": real}


if __name__ == "__main__":
    db = sys.argv[1]
    rest = [a for a in sys.argv[2:] if a != "loaders-only"]
    steps = int(rest[0]) if rest else 120
    loader_throughput(db)
    if "loaders-only" not in sys.argv:
        train_throughput(db, steps)
