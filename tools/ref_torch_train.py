"""Train the REFERENCE's own PyTorch modules in-env and emit a .ckpt.

Produces the trained reference checkpoint the migration quality-parity
A/B needs (VERDICT r3 item 2): the reference's actual EncoderV2 /
GeneratorV2 / VariationalEncoder / CachedPQMF / AudioDistanceV1
(rave/blocks.py, rave/pqmf.py, rave/core.py — executed verbatim under
torch through tests/_reference_oracle.py's dependency shim) trained
phase-1 style (reference rave/model.py:288-345: multiband + fullband
AudioDistanceV1 + beta*KL, Adam(lr 1e-3, betas (.5, .9))) on real corpus
crops, then saved as a Lightning-layout {"state_dict": ...} checkpoint
(keys encoder.encoder.* / decoder.* + latent PCA buffers) that
`rave-tpu import_torch` consumes.

Scale is chosen for the single in-env CPU core (the reference's 10k-step
GPU runs are out of reach): capacity 32, latent 32, n_signal 65536,
a few hundred steps — enough that the model demonstrably learned
(loss curve printed) and the A/B compares *trained* weights.

Usage:
  python tools/ref_torch_train.py --corpus data_r4/corpus \
      --out data_r4/ref_torch.ckpt --steps 400
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIG = dict(
    capacity=32,
    latent_size=32,
    ratios=[4, 4, 4, 2],
    kernel_size=3,
    dilations=[[1, 3, 9], [1, 3, 9], [1, 3, 9], [1, 3]],
    n_band=16,
    n_signal=65536,
    batch=4,
    sr=44100,
)


def build_reference_model(torch):
    from tests._reference_oracle import load_ref

    rb = load_ref("rave/blocks.py", "refblocks_train")
    rb.normalization = lambda m, mode="weight_norm": (
        torch.nn.utils.weight_norm(m)
    )
    cc0 = rb.cc
    ccb = types.SimpleNamespace(
        **{k: getattr(cc0, k) for k in dir(cc0) if not k.startswith("_")}
    )
    ccb.Conv1d = functools.partial(cc0.Conv1d, bias=False)
    ccb.ConvTranspose1d = functools.partial(cc0.ConvTranspose1d, bias=False)
    rb.cc = ccb
    pq = load_ref("rave/pqmf.py", "refpqmf_train")
    core = load_ref("rave/core.py", "refcore_train")

    C = CONFIG
    arch = dict(
        capacity=C["capacity"], ratios=C["ratios"],
        latent_size=C["latent_size"], kernel_size=C["kernel_size"],
        dilations=C["dilations"],
    )
    encoder = rb.VariationalEncoder(
        encoder=functools.partial(
            rb.EncoderV2, data_size=C["n_band"], n_out=2, **arch
        )
    )
    decoder = rb.GeneratorV2(
        data_size=C["n_band"], amplitude_modulation=True, **arch
    )
    pqmf = pq.CachedPQMF(100, C["n_band"])
    distance = core.AudioDistanceV1(
        multiscale_stft=functools.partial(
            core.MultiScaleSTFT, scales=[2048, 1024, 512, 256, 128],
            sample_rate=C["sr"],
        ),
        log_epsilon=1e-7,
    )
    return encoder, decoder, pqmf, distance


def crop_batches(corpus: Path, steps: int, rng):
    """Random n_signal crops from the corpus wavs (decoded once, pooled)."""
    from scipy.io import wavfile

    C = CONFIG
    wavs = sorted(corpus.glob("*.wav"))[:40]
    pool = []
    for w in wavs:
        _, y = wavfile.read(w)
        pool.append(np.asarray(y, np.float32) / 32767.0)
    for _ in range(steps):
        xs = []
        for _ in range(C["batch"]):
            y = pool[rng.integers(len(pool))]
            o = rng.integers(0, len(y) - C["n_signal"])
            xs.append(y[o : o + C["n_signal"]])
        yield np.stack(xs)[:, None, :]  # [B, 1, T]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--beta", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    torch.manual_seed(args.seed)
    encoder, decoder, pqmf, distance = build_reference_model(torch)
    params = (
        list(encoder.parameters())
        + list(decoder.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-3, betas=(0.5, 0.9))

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    first = last = None
    means = []
    for step, xb in enumerate(crop_batches(Path(args.corpus), args.steps, rng)):
        x = torch.from_numpy(xb)
        x_mb = pqmf(x)
        z = encoder(x_mb)
        zs, kl = encoder.reparametrize(z)
        y_mb = decoder(zs)
        y = pqmf.inverse(y_mb)[..., : x.shape[-1]]
        y_mb = y_mb[..., : x_mb.shape[-1]]
        d_mb = distance(x_mb, y_mb)["spectral_distance"]
        d_fb = distance(x, y)["spectral_distance"]
        loss = d_mb + d_fb + args.beta * kl
        opt.zero_grad()
        loss.backward()
        opt.step()
        if first is None:
            first = float(loss)
        last = float(loss)
        if step >= args.steps - 50:  # PCA pool from the trained tail
            with torch.no_grad():
                mean = torch.split(z, z.shape[1] // 2, 1)[0]
            means.append(mean.detach().numpy())
        if step % 20 == 0:
            print(
                f"step {step}: loss {float(loss):.3f} (mb {float(d_mb):.3f} "
                f"fb {float(d_fb):.3f} kl {float(kl):.1f}) "
                f"[{time.time()-t0:.0f}s]",
                flush=True,
            )

    # latent PCA buffers (reference rave/model.py:463-488 fits sklearn PCA
    # on pooled validation latents; plain SVD is the same math)
    zs = np.concatenate([m.transpose(0, 2, 1).reshape(-1, CONFIG["latent_size"]) for m in means], 0)
    mu = zs.mean(0)
    zc = zs - mu
    _, s, vt = np.linalg.svd(zc, full_matrices=False)
    var = s**2 / (len(zc) - 1)
    fidelity = np.cumsum(var) / var.sum()

    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v.detach()
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v.detach()
    sd["latent_pca"] = torch.from_numpy(vt.astype(np.float32))
    sd["latent_mean"] = torch.from_numpy(mu.astype(np.float32))
    sd["fidelity"] = torch.from_numpy(fidelity.astype(np.float32))
    torch.save({"state_dict": sd}, args.out)
    print(
        f"trained {args.steps} steps: loss {first:.3f} -> {last:.3f}; "
        f"saved {args.out}"
    )


if __name__ == "__main__":
    main()
