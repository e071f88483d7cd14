"""`rave-tpu` command line — the scripts/main_cli.py equivalent.

Subcommands: preprocess | train | train_prior | export | generate |
remote_dataset (reference scripts/main_cli.py:5-7).
"""
from __future__ import annotations

import argparse
import sys


def _add_config_flags(p: argparse.ArgumentParser):
    p.add_argument(
        "--config", action="append", default=[],
        help="config preset (stackable, e.g. --config v2 --config causal)",
    )
    p.add_argument(
        "--override", action="append", default=[],
        help="dotted config override, e.g. train.beta_target=0.2",
    )
    p.add_argument(
        "--augment", action="append", default=[],
        help="augmentation: registry name (mute|compress|gain), inline "
        "JSON spec ('{\"type\":\"RandomCompress\",...}'), or a Python "
        "file calling add_augmentation(...) (the gin-file equivalent)",
    )


def cmd_preprocess(argv):
    p = argparse.ArgumentParser("rave-tpu preprocess")
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--num_signal", type=int, default=131072)
    p.add_argument("--sampling_rate", type=int, default=44100)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--lazy", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    a = p.parse_args(argv)
    from rave_tpu.data.preprocess import preprocess

    meta = preprocess(
        a.input_path, a.output_path, a.num_signal, a.sampling_rate,
        a.channels, a.lazy, a.workers,
    )
    print(meta)


def cmd_train(argv):
    p = argparse.ArgumentParser("rave-tpu train")
    _add_config_flags(p)
    p.add_argument("--name", required=True)
    p.add_argument("--db_path", required=True)
    p.add_argument("--out_path", default="runs")
    p.add_argument("--channels", type=int, default=0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n_signal", type=int, default=131072)
    p.add_argument("--max_steps", type=int, default=6_000_000)
    p.add_argument("--val_every", type=int, default=10000)
    p.add_argument("--save_every", type=int, default=500000)
    p.add_argument("--smoke_test", action="store_true")
    p.add_argument("--ema", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--derivative", action="store_true")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--rand_pitch", type=float, default=None)
    p.add_argument("--no_progress", action="store_true")
    p.add_argument(
        "--trace_steps", type=int, default=0,
        help="capture a jax.profiler trace for N steps into <run>/trace",
    )
    p.add_argument(
        "--device_data", choices=("auto", "on", "off"), default="auto",
        help="device-resident dataset: whole int16 db in HBM, batches "
        "assembled on-chip (auto: when the db fits "
        "$RAVE_TPU_DEVICE_DATA_MAX_GB, default 4)",
    )
    p.add_argument(
        "--bf16", action="store_true",
        help="bf16 fast mode: model compute and critic in bfloat16 "
        "(master weights stay fp32) — shorthand for "
        "--override train.bf16=true --override train.bf16_dis=true; "
        "quality-gated vs fp32 (docs/performance_guide.md A/B)",
    )
    a = p.parse_args(argv)

    from rave_tpu import config as config_lib
    from rave_tpu.train.loop import train

    cfg = config_lib.compose(a.config or ["v2"], a.override)
    if a.bf16:
        cfg.train.bf16 = True
        cfg.train.bf16_dis = True
    cfg.data.batch = a.batch
    cfg.data.n_signal = a.n_signal
    cfg.data.workers = a.workers
    cfg.data.derivative = a.derivative
    cfg.data.normalize = a.normalize
    cfg.data.rand_pitch = a.rand_pitch
    if a.augment:
        cfg.data.augmentations = tuple(list(cfg.data.augmentations) + a.augment)
    if a.ema is not None:
        cfg.train.ema = a.ema
    run_dir = train(
        cfg,
        a.db_path,
        name=a.name,
        out_path=a.out_path,
        n_channels=a.channels or None,
        max_steps=a.max_steps,
        val_every=a.val_every,
        save_every=a.save_every,
        smoke_test=a.smoke_test,
        seed=a.seed,
        resume=not a.no_resume,
        progress=not a.no_progress,
        trace_steps=a.trace_steps,
        device_data=a.device_data,
    )
    print(f"run dir: {run_dir}")


def cmd_train_prior(argv):
    p = argparse.ArgumentParser("rave-tpu train_prior")
    p.add_argument("--run", required=True, help="pretrained RAVE run dir")
    p.add_argument("--db_path", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--out_path", default="runs")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n_signal", type=int, default=131072)
    p.add_argument("--max_steps", type=int, default=1_000_000)
    p.add_argument("--val_every", type=int, default=10000)
    p.add_argument("--fidelity", type=float, default=0.95)
    p.add_argument(
        "--config", default=None,
        help="reference prior gin file (configs/prior/prior_v1.gin) — "
        "VariationalPrior bindings become the architecture defaults; "
        "explicit flags below override",
    )
    # prior architecture (the reference's prior_v1.gin bindings,
    # rave/configs/prior/prior_v1.gin:1-8)
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--res_size", type=int, default=None)
    p.add_argument("--skp_size", type=int, default=None)
    p.add_argument("--kernel_size", type=int, default=None)
    p.add_argument("--cycle_size", type=int, default=None)
    p.add_argument("--n_layers", type=int, default=None)
    p.add_argument("--smoke_test", action="store_true")
    a = p.parse_args(argv)
    from rave_tpu.prior.train import train_prior

    # stock defaults == prior_v1.gin; a --config gin overrides them, an
    # explicit CLI flag overrides both
    arch = dict(resolution=32, res_size=512, skp_size=256, kernel_size=3,
                cycle_size=4, n_layers=10)
    if a.config:
        from rave_tpu.config_gin import prior_kwargs_from_gin

        arch.update(prior_kwargs_from_gin(a.config))
    for k in arch:
        v = getattr(a, k)
        if v is not None:
            arch[k] = v

    train_prior(
        run=a.run, db_path=a.db_path, name=a.name, out_path=a.out_path,
        batch=a.batch, n_signal=a.n_signal, max_steps=a.max_steps,
        val_every=a.val_every, fidelity=a.fidelity,
        smoke_test=a.smoke_test, **arch,
    )


def cmd_export(argv):
    p = argparse.ArgumentParser("rave-tpu export")
    p.add_argument("--run", required=True)
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--fidelity", type=float, default=0.95)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--ema_weights", action="store_true")
    p.add_argument("--channels", type=int, default=0)
    p.add_argument("--sr", type=int, default=0, help="target sample rate")
    p.add_argument("--output", default=None)
    p.add_argument("--prior", default=None, help="prior run dir to bundle")
    a = p.parse_args(argv)
    from rave_tpu.export.export import export_model

    path = export_model(
        run=a.run, streaming=a.streaming, fidelity=a.fidelity,
        stereo=a.stereo, use_ema=a.ema_weights,
        channels=a.channels or None, target_sr=a.sr or None, output=a.output,
        prior=a.prior,
    )
    print(f"exported: {path}")


def cmd_export_onnx(argv):
    """ONNX export (reference scripts/export_onnx.py parity): emits a true
    opset-12 `.onnx` with dynamic audio length for the v1 family, plus the
    portable AOT StableHLO graph (every family, any PJRT/IREE-style
    runtime)."""
    p = argparse.ArgumentParser("rave-tpu export_onnx")
    p.add_argument("--run", required=True)
    p.add_argument("--n_signal", type=int, default=131072)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--output", default=None)
    p.add_argument(
        "--deterministic", action="store_true",
        help="use the posterior mean instead of RandomNormalLike sampling",
    )
    p.add_argument(
        "--verify", action="store_true",
        help="evaluate the .onnx with the in-repo interpreter and compare "
        "against the live model",
    )
    p.add_argument(
        "--skip_stablehlo", action="store_true",
        help="emit only the .onnx (skip the portable StableHLO export)",
    )
    a = p.parse_args(argv)
    from pathlib import Path

    from rave_tpu.export.portable import export_portable, load_run

    cfg, params, model_state, n_channels, run_dir = load_run(a.run)
    try:
        from rave_tpu.export.onnx_export import export_onnx_model

        if n_channels != 1:
            raise NotImplementedError(
                "ONNX export is mono; use the StableHLO path for "
                f"n_channels={n_channels}"
            )
        data = export_onnx_model(
            cfg, {"params": params, **model_state},
            deterministic=a.deterministic,
        )
        onnx_path = Path(a.output or run_dir) / f"{cfg.name}.onnx"
        onnx_path.parent.mkdir(parents=True, exist_ok=True)
        onnx_path.write_bytes(data)
        print(f"exported: {onnx_path}")
        if a.verify:
            _verify_onnx(cfg, params, model_state, n_channels, data)
    except NotImplementedError as e:
        print(f"no .onnx for this configuration ({e})")

    if not a.skip_stablehlo:
        path = export_portable(
            run=a.run, n_signal=a.n_signal, batch=a.batch, output=a.output
        )
        print(f"exported: {path}")


def _verify_onnx(cfg, params, model_state, n_channels, data):
    """Interpreter-vs-live-model check (no onnxruntime in this env)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rave_tpu.factory import build_rave

    model = build_rave(cfg, n_channels=n_channels, train=False)
    variables = {"params": params, **model_state}
    T = cfg.n_band * 256
    x = (np.random.default_rng(0).normal(size=(1, 1, T)) * 0.3).astype(
        np.float32
    )
    @jax.jit
    def fwd_mean(xin):
        z = model.apply(variables, xin, method="encode")
        return model.apply(
            variables, z[..., : cfg.latent_size], method="decode",
            rngs={"noise": jax.random.key(0)},
        )

    want = fwd_mean(jnp.asarray(x.transpose(0, 2, 1)))
    from rave_tpu.export.onnx_export import export_onnx_model
    from rave_tpu.export.onnx_run import run as onnx_run

    det = export_onnx_model(cfg, variables, deterministic=True)
    got = onnx_run(det, {"audio_in": x})["audio_out"]
    err = float(np.abs(got - np.asarray(want).transpose(0, 2, 1)).max())
    print(f"verify: max |onnx - live| = {err:.2e} over {T} samples")
    assert err < 1e-4, "ONNX verification failed"


def cmd_generate(argv):
    p = argparse.ArgumentParser("rave-tpu generate")
    p.add_argument("--model", required=True, help="run dir or exported artifact")
    p.add_argument("--input", nargs="+", default=[])
    p.add_argument("--out_path", default="generated")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--chunk_size", type=int, default=0)
    p.add_argument(
        "--prior_seconds", type=float, default=0.0,
        help="unconditional generation: sample this many seconds of latents "
        "from the artifact's bundled prior and decode (no --input needed)",
    )
    p.add_argument("--prior_samples", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    if not a.input and not a.prior_seconds:
        p.error("either --input files or --prior_seconds is required")
    from rave_tpu.export.generate import generate

    generate(
        model=a.model, inputs=a.input, out_path=a.out_path,
        streaming=a.streaming, chunk_size=a.chunk_size or None,
        prior_seconds=a.prior_seconds, prior_samples=a.prior_samples,
        seed=a.seed,
    )


def cmd_eval(argv):
    """Reconstruction metrics of a run over a dataset split (beyond the
    reference CLI — lets imported checkpoints / EMA shadows be compared)."""
    from rave_tpu.train.evaluate import main as eval_main

    eval_main(argv)


def cmd_import_torch(argv):
    """Migrate a trained PyTorch reference checkpoint (acids-ircam/RAVE
    .ckpt) into a run directory this framework can export/generate from."""
    p = argparse.ArgumentParser("rave-tpu import_torch")
    _add_config_flags(p)
    p.add_argument("--ckpt", required=True, help="reference .ckpt file")
    p.add_argument("--name", required=True)
    p.add_argument("--out_path", default="runs")
    p.add_argument("--channels", type=int, default=1)
    p.add_argument(
        "--ema_weights", action="store_true",
        help="import the EMA shadow (ckpt['callbacks']['EMA']) instead of "
        "the live weights (reference scripts/export.py:507-511)",
    )
    a = p.parse_args(argv)

    import jax

    jax.devices()  # initialize the backend before torch (DEVNOTES.md)
    import torch

    from rave_tpu import config as config_lib
    from rave_tpu.factory import build_discriminator, build_rave
    from rave_tpu.train.loop import make_run_dir
    from rave_tpu.train.state import create_train_state
    from rave_tpu.utils.checkpoint import save_checkpoint
    from rave_tpu.utils.import_torch import import_reference_checkpoint

    ckpt = torch.load(a.ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if a.ema_weights:
        ema = ckpt.get("callbacks", {}).get("EMA")
        if not ema:
            raise SystemExit("checkpoint has no EMA callback state")
        sd = {**sd, **ema}
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    cfg = config_lib.compose(a.config or ["v2"], a.override)
    cfg.data.n_channels = a.channels
    model = build_rave(cfg, n_channels=a.channels, train=True)
    dis = build_discriminator(cfg, n_channels=a.channels)
    state = create_train_state(
        cfg, model, dis, jax.random.key(0), n_channels=a.channels
    )
    params, buffers, codebook, batch_stats = import_reference_checkpoint(
        sd, state.gen_params, state.model_state.get("buffers", {}),
        state.model_state.get("codebook"),
    )
    model_state = {**state.model_state, "buffers": buffers}
    if codebook is not None:
        model_state["codebook"] = codebook
    if batch_stats is not None:
        model_state["batch_stats"] = batch_stats
    state = state.replace(gen_params=params, model_state=model_state)
    run_dir = make_run_dir(a.out_path, a.name, cfg)
    save_checkpoint(str(run_dir), 0, jax.device_get(state))
    print(f"imported into: {run_dir}")


def cmd_remote_dataset(argv):
    p = argparse.ArgumentParser("rave-tpu remote_dataset")
    p.add_argument("--db_path", required=True)
    p.add_argument("--port", type=int, default=5000)
    a = p.parse_args(argv)
    from rave_tpu.data.server import serve

    serve(a.db_path, a.port)


COMMANDS = {
    "preprocess": cmd_preprocess,
    "train": cmd_train,
    "train_prior": cmd_train_prior,
    "export": cmd_export,
    "export_onnx": cmd_export_onnx,
    "generate": cmd_generate,
    "eval": cmd_eval,
    "import_torch": cmd_import_torch,
    "remote_dataset": cmd_remote_dataset,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: rave-tpu {" + ",".join(COMMANDS) + "} ...")
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd}; available: {sorted(COMMANDS)}")
        return 1
    COMMANDS[cmd](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
