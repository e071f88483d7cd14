"""Portable full-graph export (the scripts/export_onnx.py analog).

The reference swaps cached convs for plain ones and emits an ONNX graph
(export_onnx.py:32-91). The TPU-native equivalent is an AOT-lowered
StableHLO module of the offline forward (encode -> sample -> decode) —
serialized with jax.export, loadable by any PJRT host or StableHLO
consumer (IREE, XLA C++ API) without Python. A TF SavedModel bridge is
emitted too when TensorFlow is importable.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from rave_tpu import config as config_lib
from rave_tpu.export.export import load_run
from rave_tpu.factory import build_rave


def export_portable(
    run: str,
    n_signal: int = 131072,
    batch: int = 1,
    output: Optional[str] = None,
) -> str:
    cfg, params, model_state, n_channels, run_dir = load_run(run)
    model = build_rave(cfg, n_channels=n_channels, train=False)
    variables = {"params": params, **model_state}

    # params/buffers are baked into the module as constants (same contract
    # as the .rtpu AOT methods): consumers feed only (x, seed) — the
    # reference's .onnx likewise carries its weights inline.
    def forward(x, seed):
        rng = jax.random.key(seed)

        def run_fn(mdl):
            z = mdl.encoder(mdl.transform_input(x))
            zs, _ = mdl.reparametrize(z, rng=rng)
            return mdl.decode(zs)

        return model.apply(variables, method=run_fn, rngs={"noise": rng})

    x = jnp.zeros((batch, n_signal, n_channels), jnp.float32)
    seed = jnp.uint32(0)

    out_dir = Path(output or run_dir) / f"{cfg.name}_portable"
    out_dir.mkdir(parents=True, exist_ok=True)

    from jax import export as jex

    exp = jex.export(jax.jit(forward))(x, seed)
    (out_dir / "forward.stablehlo").write_bytes(exp.serialize())
    (out_dir / "forward.mlir").write_bytes(exp.mlir_module_serialized)
    (out_dir / "manifest.json").write_text(
        json.dumps(
            {
                "format": "stablehlo-v1",
                "input": [batch, n_signal, n_channels],
                "inputs": [
                    {"shape": [int(d) for d in a.shape], "dtype": str(a.dtype)}
                    for a in exp.in_avals
                ],
                "outputs": [
                    {"shape": [int(d) for d in a.shape], "dtype": str(a.dtype)}
                    for a in exp.out_avals
                ],
                "kept_inputs": [int(i) for i in exp.module_kept_var_idx],
                "sampling_rate": cfg.sampling_rate,
                "config": config_lib.to_dict(cfg),
            },
            indent=2,
        )
    )

    # optional TF SavedModel bridge
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf

        f_tf = tf.function(
            jax2tf.convert(
                lambda xx: forward(xx, jnp.uint32(0)),
                with_gradient=False,
            ),
            autograph=False,
            input_signature=[
                tf.TensorSpec([batch, n_signal, n_channels], tf.float32)
            ],
        )
        module = tf.Module()
        module.f = f_tf
        tf.saved_model.save(module, str(out_dir / "saved_model"))
    except Exception as e:  # noqa: BLE001 — bridge is best-effort
        (out_dir / "tf_bridge_skipped.txt").write_text(repr(e))

    return str(out_dir)
