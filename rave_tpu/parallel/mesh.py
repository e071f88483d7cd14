"""Device mesh + sharding rules for data-parallel training.

The reference's only parallelism is implicit Lightning DDP, unused in
practice (SURVEY.md §2.13). Here DP is first-class and TPU-native:

  * a 1-D `jax.sharding.Mesh` over all chips ('data' axis, ICI-adjacent);
  * the batch is sharded on 'data', every state leaf is replicated;
  * the jitted train step runs SPMD — XLA inserts psum gradient reductions
    over ICI; RVQ codebook/EMA statistics are computed from the *global*
    batch, so replicated updates stay bit-identical on every chip
    (preserving the reference's replicated-decision invariant,
    rave/quantization.py:169-179).

Cross-host input sharding lives in rave_tpu/data/loader.py (host_id /
host_count shard of the sample indices).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), ("data",))


def shard_batch(mesh: Mesh, x) -> jax.Array:
    """[B, T, C] batch, B sharded across the 'data' axis."""
    n = mesh.shape["data"]
    if np.shape(x)[0] % n != 0:
        raise ValueError(
            f"batch size {np.shape(x)[0]} must be divisible by the "
            f"{n}-device data mesh — pass --batch as a multiple of {n}"
        )
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def local_batch_to_global(mesh: Mesh, local: np.ndarray) -> jax.Array:
    """Multi-host entry: assemble a globally-sharded batch from each
    host's local shard. Device order in the mesh is process-major, so
    host i contributes rows [i*B_local, (i+1)*B_local) of the global
    batch."""
    sharding = NamedSharding(mesh, P("data"))
    global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local, global_shape)


def put_batch(mesh: Mesh, x) -> jax.Array:
    """Host batch -> device batch sharded on 'data'. Single-process: an
    async device_put; multi-process: global-batch assembly across hosts
    (each host loads its own shard of the sample indices,
    rave_tpu/data/loader.py)."""
    if jax.process_count() > 1:
        return local_batch_to_global(mesh, np.asarray(x, np.float32))
    return shard_batch(mesh, x)


def all_processes_min(value: int) -> int:
    """Smallest `value` across hosts (e.g. common per-host batch count so
    collective-bearing loops stay in lockstep). Single-process: identity."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([value]))
    return int(np.min(vals))


def gather_to_hosts(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly cross-host sharded) array to every host as numpy.
    Single-process: plain device_get."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
