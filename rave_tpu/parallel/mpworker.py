"""Deterministic multi-process DP worker (test / dry-run harness).

Proves the multi-host data-parallel path of SURVEY.md §2.13: each process
owns a shard of the global batch (`put_batch` -> `make_array_from_process_
local_data`), the jitted two-phase GAN steps run SPMD over the global mesh
with cross-process collectives, and every process observes identical
replicated losses/parameters. A single-process run over the same global
device count must produce the same numbers — the invariant asserted by
tests/test_multiprocess.py.

Usage (one invocation per process):

    python -m rave_tpu.parallel.mpworker <process_id> <num_processes> \
        <coordinator_port> <local_device_count>

Prints one line: `MPWORKER {json}` with per-step losses and a parameter
checksum.
"""
from __future__ import annotations

import json
import os
import sys

# as small as the architecture allows: XLA CPU compiles of the GAN step
# run once per process topology, and this worker exists to prove collective
# semantics, not model capacity
TINY = [
    "capacity=2",
    "discriminator.capacity=2",
    "discriminator.kind=multiscale",
    "discriminator.n_scales=1",
    "discriminator.n_layers=2",
    "discriminator.kernel_size=7",
    "latent_size=4",
    "ratios=[4,2]",
    "dilations=[[1],[1]]",
    "distance.scales=[256]",
    "train.phase_1_duration=2",
    "train.update_discriminator_every=2",
    "train.ema=0.99",
]
N_SIGNAL = 2048


def run(
    process_id: int,
    num_processes: int,
    port: int,
    local_devices: int,
    configure: bool = True,
) -> dict:
    """Run 3 deterministic train steps (gen pre-warmup, gen adversarial,
    dis); returns {step losses..., checksum}. With `configure` the CPU
    backend is pinned before first device use (multi-process needs the
    gloo collectives implementation for cross-host psum)."""
    if configure:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_devices)
        # oracle tests compare against fp32-exact matmuls (tests/conftest.py)
        jax.config.update("jax_default_matmul_precision", "highest")
        # inherit the test suite's fast-compile mode (tests/conftest.py):
        # all ranks AND the single-process oracle share the flag, so the
        # bitwise cross-rank comparison stays apples-to-apples
        if os.environ.get("RAVE_TPU_TEST_FAST", "0") != "0":
            jax.config.update("jax_disable_most_optimizations", True)
        if num_processes > 1:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
            jax.distributed.initialize(
                f"127.0.0.1:{port}",
                num_processes=num_processes,
                process_id=process_id,
            )
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rave_tpu.config import compose
    from rave_tpu.factory import build_discriminator, build_rave
    from rave_tpu.parallel.mesh import data_mesh, put_batch, replicate
    from rave_tpu.train import build_train_steps, create_train_state

    assert jax.process_count() == num_processes, (
        jax.process_count(), num_processes
    )
    cfg = compose(["v2"], TINY)
    model = build_rave(cfg, n_channels=1, train=True)
    dis = build_discriminator(cfg, n_channels=1)
    state = create_train_state(cfg, model, dis, jax.random.key(0), n_signal=N_SIGNAL)
    mesh = data_mesh()
    state = replicate(mesh, state)
    steps = build_train_steps(cfg, model, dis, crop_frames=(1, 1))

    G = jax.device_count()
    x_global = (
        np.random.default_rng(7).standard_normal((G, N_SIGNAL, 1)) * 0.1
    ).astype(np.float32)
    per = G // num_processes
    local = x_global[process_id * per : (process_id + 1) * per]

    out = {}
    # diagnostics: the assembled global batch and the initial params must
    # agree across topologies before any step runs
    xb0 = put_batch(mesh, local)
    out["x_checksum"] = float(jnp.sum(jnp.abs(xb0)))
    out["param0_checksum"] = float(
        sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(state.gen_params))
    )
    schedule = [("gen", False), ("gen", True), ("dis", True)]
    for i, (which, warmed) in enumerate(schedule):
        xb = put_batch(mesh, local)
        rng = jax.random.fold_in(jax.random.key(1), i)
        if which == "gen":
            state, m = steps["gen"](state, xb, rng, warmed=warmed, quantize=False)
            out[f"step{i}_loss_gen"] = float(m["loss_gen"])
        else:
            state, m = steps["dis"](state, xb, rng, quantize=False)
            out[f"step{i}_loss_dis"] = float(m["loss_dis"])
    # replicated-parameter checksum: bit-identity across processes and
    # across process topologies
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(state.gen_params):
        total += float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    out["checksum"] = total
    out["process_count"] = int(jax.process_count())
    out["device_count"] = int(G)
    return out


def main(argv):
    process_id, num_processes, port, local_devices = (int(a) for a in argv[:4])
    os.environ.pop("XLA_FLAGS", None)  # jax_num_cpu_devices is authoritative
    # NO persistent compile cache: XLA:CPU AOT executables are keyed by the
    # compiling process's machine-feature autodetection, which differs
    # across launcher environments on this machine — loading a mismatched
    # executable silently corrupts numerics (see tests/conftest.py). The
    # worker model is deliberately tiny, so cold JIT is cheap.
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    out = run(process_id, num_processes, port, local_devices)
    print("MPWORKER " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
