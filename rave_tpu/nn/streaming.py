"""Helpers to run any dual-mode module in chunked streaming mode.

The contract (tested by tests/test_streaming.py, the analog of the
reference's tests/test_residual.py oracle): for a module with cumulative
delay D (output-rate samples),

    stream(x chunked)[..., D:, :]  ==  offline(x)[..., :-D, :]

bit-exactly in 'causal' mode (D == 0) and within float tolerance in
'centered' mode.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def init_stream_state(module, rng, example_chunk, rngs: Optional[Dict] = None):
    """Fresh 'cache' collection for `module` (stream_batch must match)."""
    all_rngs = {"params": rng}
    if rngs:
        all_rngs.update(rngs)
    variables = module.init(all_rngs, example_chunk)
    return variables.get("cache", {})


def stream_apply(module, params, cache, x, rngs: Optional[Dict] = None):
    """One streaming step: returns (y, new_cache)."""
    variables = {"params": params, "cache": cache}
    y, updated = module.apply(
        variables, x, method="step", mutable=["cache"], rngs=rngs
    )
    return y, updated["cache"]


def stream_chunks(module, params, cache, x, chunk: int, rngs=None):
    """Feed [B, T, C] in chunks of `chunk`; returns (y, cache)."""
    outs = []
    for i in range(0, x.shape[1], chunk):
        y, cache = stream_apply(module, params, cache, x[:, i : i + chunk, :], rngs)
        outs.append(y)
    return jnp.concatenate(outs, axis=1), cache
