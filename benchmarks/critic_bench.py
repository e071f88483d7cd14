"""Descript-critic decomposition bench: where do the v3 milliseconds go?

Times fwd+bwd (grads wrt params AND input, like the real GAN steps) of the
full DescriptDiscriminator and its components at the training geometry
(xy batch 16 x 131072), with XLA cost_analysis FLOPs/bytes so each row
carries its roofline: t_flops = flops/peak, t_mem = bytes/bw.

Usage: python benchmarks/critic_bench.py [full mpd mrd stft convs ...]
Set RAVE_TPU_STFT=matmul to A/B the DFT-as-matmul path.
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

# TPU v5e (v5 lite): 197 TFLOP/s bf16 MXU peak, ~819 GB/s HBM.
PEAKS = {"TPU v5 lite": (197e12, 819e9)}


def peak():
    kind = jax.devices()[0].device_kind
    return PEAKS.get(kind, (197e12, 819e9))


def bench(label, f, *args, iters=8):
    """Time jitted f(*args) -> scalar, fwd+bwd marginal per-iter; print roofline."""
    jf = jax.jit(f)
    c = jf.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops, byts = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
    float(jf(*args))  # warm
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = jf(*args)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    pf, bw = peak()
    t_f, t_m = flops / pf, byts / bw
    print(
        f"{label:28s} {dt*1e3:8.1f} ms | {flops/1e12:7.2f} TF {byts/1e9:6.1f} GB"
        f" | roofline max(f,m) {max(t_f, t_m)*1e3:6.1f} ms"
        f" | MFU {flops/pf/dt*100:5.1f}% membw {byts/bw/dt*100:5.1f}%",
        flush=True,
    )
    return dt


def main(which):
    from rave_tpu.models.descript import BANDS, MPD, MRD, DescriptDiscriminator
    from rave_tpu.ops.stft import stft

    B, T = 16, 131072
    key = jax.random.key(0)
    dtype = jnp.bfloat16 if "bf16" in which else jnp.float32
    x = (jax.random.normal(key, (B, T, 1), jnp.float32) * 0.1).astype(dtype)

    def fwd_bwd(module, xin):
        params = jax.jit(module.init)(jax.random.key(1), xin)["params"]

        def loss(p, xi):
            feats = module.apply({"params": p}, xi)
            tot = 0.0
            for f in jax.tree_util.tree_leaves(feats):
                tot = tot + jnp.sum(f.astype(jnp.float32) ** 2)
            return tot

        def run(p, xi):
            l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, xi)
            s = l
            for g in jax.tree_util.tree_leaves((gp, gx)):
                s = s + jnp.sum(jnp.abs(g))
            return s

        return run, params

    if "full" in which and "pf" not in which:
        run, p = fwd_bwd(DescriptDiscriminator(), x)
        bench("descript full", run, p, x)
    import flax.linen as fnn

    if "mpd" in which:
        class MPDStack(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                return [MPD(period=p, name=f"mpd_{p}")(x) for p in (2, 3, 5, 7, 11)]
        run, p = fwd_bwd(MPDStack(), x)
        bench("MPD stack (5 periods)", run, p, x)
    pf = "pf" in which  # packed fmaps (the training configuration)
    if "full" in which and pf:
        run, p = fwd_bwd(DescriptDiscriminator(packed_fmaps=True), x)
        bench("descript full (pf)", run, p, x)
    if "mrd" in which:
        class MRDStack(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                return [MRD(window_length=w, packed_fmaps=pf, name=f"mrd_{w}")(x)
                        for w in (2048, 1024, 512)]
        run, p = fwd_bwd(MRDStack(), x)
        bench(f"MRD stack (3 res){' pf' if pf else ''}", run, p, x)
    if "mrd1" in which:
        for w in (2048, 1024, 512):
            run, p = fwd_bwd(MRD(window_length=w), x)
            bench(f"MRD w={w}", run, p, x)
    if "stft" in which:
        def stfts(xi):
            flat = xi.swapaxes(1, 2).reshape(-1, T)
            tot = 0.0
            for w in (2048, 1024, 512):
                s = stft(flat, w, w // 4)
                tot = tot + jnp.sum(s.real**2) + jnp.sum(s.imag**2)
            return tot

        def run(xi):
            l, g = jax.value_and_grad(stfts)(xi)
            return l + jnp.sum(jnp.abs(g))

        bench("MRD stfts only (3 res)", run, x)
    if "convs" in which:
        # conv stacks on precomputed spectrogram images
        import flax.linen as nn
        from rave_tpu.models.discriminators import WNConv

        class BandConvs(nn.Module):
            window_length: int

            @nn.compact
            def __call__(self, img):
                n_fft = self.window_length // 2 + 1
                bands = [(int(a * n_fft), int(b * n_fft)) for a, b in BANDS]
                fmap, outs = [], []
                spec = [
                    ((3, 9), (1, 1), (1, 4)),
                    ((3, 9), (1, 2), (1, 4)),
                    ((3, 9), (1, 2), (1, 4)),
                    ((3, 9), (1, 2), (1, 4)),
                    ((3, 3), (1, 1), (1, 1)),
                ]
                for bi, (lo, hi) in enumerate(bands):
                    band = img[:, :, lo:hi, :]
                    for li, (k, st, pd) in enumerate(spec):
                        band = WNConv(
                            features=32, kernel_size=k, strides=st, padding=pd,
                            name=f"band{bi}_conv{li}",
                        )(band)
                        fmap.append(band)
                        band = jax.nn.leaky_relu(band, 0.1)
                    outs.append(band)
                y = jnp.concatenate(outs, axis=2)
                y = WNConv(features=1, kernel_size=(3, 3), strides=(1, 1),
                           padding=(1, 1), name="post")(y)
                fmap.append(y)
                return fmap

        for w in (2048, 1024, 512):
            flat = x.astype(jnp.float32).swapaxes(1, 2).reshape(-1, T)
            s = stft(flat, w, w // 4)
            img = jnp.stack([s.real, s.imag], -1).astype(dtype)  # [B, F, bins, 2]
            run, p = fwd_bwd(BandConvs(window_length=w), img)
            bench(f"MRD convs only w={w}", run, p, img)


if __name__ == "__main__":
    main(sys.argv[1:] or ["full", "mpd", "mrd", "stft", "convs"])
