"""Migration quality-parity A/B: reference-torch metric vs rave_tpu metric.

Closes the BASELINE north star ("encode/decode latents within fp32
tolerance of the PyTorch reference") END-TO-END at dataset level
(VERDICT r3 item 2): one trained reference checkpoint
(tools/ref_torch_train.py), scored on the SAME validation batches by

  * the reference's own validation math under torch —
    encode -> reparametrize -> decode -> AudioDistanceV1
    (rave/model.py:426-443, modules executed verbatim via the oracle), and
  * rave_tpu on the checkpoint imported through `rave-tpu import_torch`.

Both frameworks run a DETERMINISTIC variant (mean latent, the tight
fp32-tolerance comparison — sampling noise cannot be seed-matched across
frameworks) and each framework's literal sampled validation (compared
statistically). Batches come from rave_tpu's own val loader (numpy,
identical arrays on both sides).

Usage: python tools/parity_ab.py --ckpt data_r4/ref_torch.ckpt \
    --run runs/refimport_* --db data_r4/db [--batches 8]
Prints a JSON table with both numbers and their relative delta.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def torch_side(ckpt_path, batches, sampled_seed=0):
    import torch

    from tools.ref_torch_train import CONFIG, build_reference_model

    torch.manual_seed(sampled_seed)
    encoder, decoder, pqmf, distance = build_reference_model(torch)
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)["state_dict"]
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
    encoder.load_state_dict(enc_sd)
    decoder.load_state_dict(dec_sd)
    encoder.eval()
    decoder.eval()

    det, sam = [], []
    with torch.no_grad():
        for xb in batches:
            x = torch.from_numpy(xb.transpose(0, 2, 1))  # [B, C, T]
            x_mb = pqmf(x)
            z = encoder(x_mb)
            mean, scale = torch.chunk(z, 2, 1)
            # deterministic: decode the mean latent
            y = pqmf.inverse(decoder(mean))[..., : x.shape[-1]]
            det.append(float(sum(distance(x, y).values())))
            # literal reference validation_step: reparametrize samples
            zs, _ = encoder.reparametrize(z)
            y = pqmf.inverse(decoder(zs))[..., : x.shape[-1]]
            sam.append(float(sum(distance(x, y).values())))
    return float(np.mean(det)), float(np.mean(sam))


def jax_side(run, batches, sampled_seed=0):
    import jax
    import jax.numpy as jnp

    from rave_tpu.export.export import load_run
    from rave_tpu.factory import build_audio_distance, build_rave

    cfg, params, model_state, n_channels, run_dir = load_run(run, False)
    model = build_rave(cfg, n_channels=n_channels, train=False)
    distance = build_audio_distance(cfg)

    @jax.jit
    def det_step(x):
        variables = {"params": params, **model_state}

        def run_fn(mdl):
            x_enc = mdl.transform_input(x)
            z = mdl.encoder(x_enc)
            mean = jnp.split(z, 2, axis=-1)[0]
            y = mdl.decode(mean)[:, : x.shape[1], :]
            return sum(distance(x, y).values())

        return model.apply(
            variables, rngs={"noise": jax.random.key(0)}, method=run_fn
        )

    @jax.jit
    def sampled_step(x, rng):
        variables = {"params": params, **model_state}

        def run_fn(mdl):
            x_enc = mdl.transform_input(x)
            z = mdl.encoder(x_enc)
            zs, _ = mdl.reparametrize(z)
            y = mdl.decode(zs)[:, : x.shape[1], :]
            return sum(distance(x, y).values())

        return model.apply(variables, rngs={"noise": rng}, method=run_fn)

    det, sam = [], []
    for b, xb in enumerate(batches):
        x = jnp.asarray(xb)
        det.append(float(det_step(x)))
        sam.append(
            float(sampled_step(x, jax.random.fold_in(jax.random.key(sampled_seed), b)))
        )
    return float(np.mean(det)), float(np.mean(sam))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--run", required=True, help="imported run dir")
    ap.add_argument("--db", required=True)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--n_signal", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.devices()  # backend init before torch (DEVNOTES.md)

    # identical numpy batches for both sides: rave_tpu's own val pipeline
    from rave_tpu.data.dataset import get_dataset, split_dataset
    from rave_tpu.data.loader import Loader

    dataset = get_dataset(args.db, 44100, args.n_signal)
    _, val_idx = split_dataset(dataset)
    loader = Loader(
        dataset, val_idx, args.batch, seed=0, shuffle=False, drop_last=False
    )
    batches = []
    for b, x in enumerate(loader.epoch(0)):
        if b >= args.batches:
            break
        batches.append(np.asarray(x, np.float32))

    j_det, j_sam = jax_side(args.run, batches)
    t_det, t_sam = torch_side(args.ckpt, batches)
    out = {
        "n_batches": len(batches),
        "clips": int(sum(b.shape[0] for b in batches)),
        "reference_torch_det": round(t_det, 6),
        "rave_tpu_det": round(j_det, 6),
        "det_rel_delta": round(abs(j_det - t_det) / t_det, 6),
        "reference_torch_sampled": round(t_sam, 6),
        "rave_tpu_sampled": round(j_sam, 6),
        "sampled_rel_delta": round(abs(j_sam - t_sam) / t_sam, 6),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
