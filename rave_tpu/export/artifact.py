"""The exported-artifact format (.rtpu) — the nn_tilde/TorchScript analog.

An artifact is a directory:
    manifest.json       — self-describing streaming metadata: per-method
                          channel counts + resampling ratios (what nn~/VST
                          use to size ring buffers, SURVEY.md §2.10),
                          latency in samples, block size, latent family,
                          attributes, framework/config provenance.
    params.msgpack      — flax params (+ constant buffers) via
                          flax.serialization.
    cache.msgpack       — zero-initialized streaming cache template.
    *.stablehlo         — optional AOT-lowered functions (jax.export) for
                          runtime-free consumption from C++ PJRT hosts.

`ExportedRAVE` reloads an artifact and exposes encode/decode/forward both
offline and chunk-streaming, including the per-family latent post/pre
processing (reference scripts/export.py:351-408) and AdaIN attributes
(export.py:110-113).
"""
from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu import config as config_lib
from rave_tpu.factory import build_rave
from rave_tpu.models import blocks


def _merge_trees(a, b):
    """Union of two nested-dict pytrees (leaves from `a` win)."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(b)
        for k, v in a.items():
            out[k] = _merge_trees(v, b[k]) if k in b else v
        return out
    return a if a is not None else b


def full_stream_cache(model, cfg, stream_batch: int, block: int, n_channels: int):
    """Zero-initialized streaming cache covering EVERY method's state.

    Different trace paths create different cache subsets (offline __call__
    materializes conv pads/carries; step_* adds skip/branch alignment
    delays), so an artifact's persistent state must be the union — AOT
    modules thread (state_in -> state_out) with a fixed pytree structure."""
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    x = jnp.zeros((stream_batch, block, n_channels), jnp.float32)
    frames = max(block // cfg.decimation(), 1)
    z = jnp.zeros(
        (stream_batch, frames, cfg.augmented_latent_size()), jnp.float32
    )
    cache = {}
    for init in (
        lambda: model.init(rngs, x),
        lambda: model.init(rngs, x, method="step_encode"),
        lambda: model.init(rngs, z, method="step_decode"),
    ):
        v = jax.eval_shape(init)
        c = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), dict(v.get("cache", {}))
        )
        cache = _merge_trees(cache, c)
    return cache


def post_process_latent(cfg, model, latent_size: int, variables, z, rng):
    """Raw encoder output -> user-facing latents, per latent family
    (reference scripts/export.py:351-408). Pure and jit/AOT-safe."""
    fam = cfg.latent.family
    bufs = variables["buffers"]
    if fam == "variational":
        mean, scale = jnp.split(z, 2, axis=-1)
        std = jax.nn.softplus(scale) + 1e-4
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        zs = mean + std * eps
        zs = zs - bufs["latent_mean"]
        zs = zs @ jnp.asarray(bufs["latent_pca"]).T
        return zs[..., :latent_size]
    if fam == "discrete":
        # [B, Q, T] indices -> channels-last [B, T, Q]
        idx = model.apply(
            variables, z, method=lambda mdl, zz: mdl.encoder.encode_indices(zz)
        )
        return idx.swapaxes(1, 2).astype(jnp.float32)
    if fam == "spherical":
        return blocks.unit_norm_vector_to_angles(z)
    return z  # wasserstein


def pre_process_latent(cfg, model, full_latent_size: int, variables, z, rng):
    """User-facing latents -> decoder input (inverse of post_process_latent
    up to sampling noise)."""
    fam = cfg.latent.family
    bufs = variables["buffers"]
    if fam == "variational":
        pad = full_latent_size - z.shape[-1]
        noise = jax.random.normal(rng, z.shape[:-1] + (pad,), z.dtype)
        z = jnp.concatenate([z, noise], axis=-1)
        z = z @ jnp.asarray(bufs["latent_pca"])
        return z + bufs["latent_mean"]
    if fam == "discrete":
        idx = jnp.clip(z, 0, cfg.latent.codebook_size - 1).astype(jnp.int32)
        # [B, T, Q] -> rvq decode expects [B, Q, T]
        zq = model.apply(
            variables,
            idx.swapaxes(1, 2),
            method=lambda mdl, ii: mdl.encoder.decode_indices(ii),
        )
        aug = cfg.latent.noise_augmentation
        if aug:
            noise = jax.random.normal(rng, zq.shape[:-1] + (aug,), zq.dtype)
            zq = jnp.concatenate([zq, noise], axis=-1)
        return zq
    if fam == "spherical":
        return blocks.angles_to_unit_norm_vector(z)
    aug = cfg.latent.noise_augmentation
    if aug:
        noise = jax.random.normal(rng, z.shape[:-1] + (aug,), z.dtype)
        z = jnp.concatenate([z, noise], axis=-1)
    return z


class ExportedRAVE:
    def __init__(self, path: str):
        self.path = Path(path)
        self.manifest = json.loads((self.path / "manifest.json").read_text())
        self.cfg = config_lib.from_dict(self.manifest["config"])
        self.n_channels = self.manifest["n_channels"]
        self.stream_batch = self.manifest["stream_batch"]
        self.model = build_rave(
            self.cfg,
            n_channels=self.n_channels,
            train=False,
            stream_batch=self.stream_batch,
        )
        x = jnp.zeros((1, self.manifest["block_size"], self.n_channels))
        template = jax.eval_shape(
            lambda: self.model.init(
                {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
            )
        )
        template = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), template
        )
        # the saved cache is the union across all methods' streaming state
        # (matches export_model; see full_stream_cache)
        template = dict(template)
        template["cache"] = full_stream_cache(
            self.model, self.cfg, self.stream_batch,
            self.manifest["block_size"], self.n_channels,
        )
        raw = (self.path / "params.msgpack").read_bytes()
        self.variables = dict(flax.serialization.from_bytes(dict(template), raw))
        self.cache = self.variables.pop("cache", {})
        self.latent_size = self.manifest["latent_size"]
        self.full_latent_size = self.manifest["full_latent_size"]
        self._rng = jax.random.key(self.manifest.get("seed", 0))
        self._jitted = {}
        # optional sample-rate adaptation (reference export.py:95-99,
        # 246-247, 291-292)
        self.resampler = None
        tsr = self.manifest.get("target_sampling_rate", self.manifest["sampling_rate"])
        if tsr != self.manifest["sampling_rate"]:
            from rave_tpu.ops.resampler import Resampler

            self.resampler = Resampler(
                target_sr=tsr,
                model_sr=self.manifest["sampling_rate"],
                stream_batch=self.stream_batch,
                n_channels=self.n_channels,
            )
            xr = jnp.zeros(
                (self.stream_batch, self.resampler.ratio * 64, self.n_channels)
            )
            rv = jax.jit(
                lambda: self.resampler.init(
                    {"params": jax.random.key(0)}, xr,
                    method="to_model_sampling_rate",
                )
            )()
            self._res_cache = jax.tree_util.tree_map(
                lambda v: jnp.zeros(v.shape, v.dtype), rv.get("cache", {})
            )
        self._prior = None
        if self.manifest.get("prior") and (self.path / "prior_params.msgpack").exists():
            from rave_tpu.prior.model import Prior

            pc = self.manifest["prior"]
            self._prior = Prior(
                latent_size=pc["latent_size"],
                resolution=pc["resolution"],
                res_size=pc["res_size"],
                skp_size=pc["skp_size"],
                kernel_size=pc["kernel_size"],
                cycle_size=pc["cycle_size"],
                n_layers=pc["n_layers"],
            )
            x0 = jnp.zeros((1, 4, pc["resolution"] * pc["latent_size"]))
            pv = jax.jit(self._prior.init)({"params": jax.random.key(0)}, x0)
            raw = (self.path / "prior_params.msgpack").read_bytes()
            self._prior_params = flax.serialization.from_bytes(pv["params"], raw)

    @property
    def has_prior(self) -> bool:
        return self._prior is not None

    def sample_prior(self, n_frames: int, rng=None, argmax: bool = False):
        """Generate latents from the bundled autoregressive prior, ready to
        feed `decode` (reference export.py:543-558 / TraceModel)."""
        if self._prior is None:
            raise RuntimeError("artifact was exported without a prior")
        from rave_tpu.prior.core import DiagonalShift, QuantizedNormal
        from rave_tpu.prior.model import generate

        if rng is None:
            rng = self._next_rng()
        pc = self.manifest["prior"]
        qn = QuantizedNormal(pc["resolution"])
        shift = DiagonalShift()
        D = pc["latent_size"]
        x0 = jnp.zeros((1, 1, pc["resolution"] * D))
        cache = self._prior_cache()
        r1, r2 = jax.random.split(rng)
        ys = generate(
            self._prior, self._prior_params, cache, x0,
            n_frames + D - 1, r1, argmax=argmax,
        )
        z = shift.inverse(qn.decode(ys, rng=r2))
        # match the artifact latent width (pad with noise / truncate)
        if z.shape[-1] < self.latent_size:
            pad = jax.random.normal(
                r2, z.shape[:-1] + (self.latent_size - z.shape[-1],), z.dtype
            )
            z = jnp.concatenate([z, pad], axis=-1)
        return z[..., : self.latent_size]

    def _prior_cache(self):
        pc = self.manifest["prior"]
        x0 = jnp.zeros((1, 1, pc["resolution"] * pc["latent_size"]))
        v = jax.jit(self._prior.init)({"params": jax.random.key(0)}, x0)
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype), v.get("cache", {})
        )

    # ---- latent post/pre processing (per family; pure, jit-safe) ---------
    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    def post_process_latent(self, variables, z, rng):
        return post_process_latent(
            self.cfg, self.model, self.latent_size, variables, z, rng
        )

    def pre_process_latent(self, variables, z, rng):
        return pre_process_latent(
            self.cfg, self.model, self.full_latent_size, variables, z, rng
        )

    def _get_jitted(self, what: str, streaming: bool):
        """One fused XLA program per (method, mode): model pass + latent
        post/pre-processing, no per-chunk eager dispatch."""
        key = (what, streaming)
        if key in self._jitted:
            return self._jitted[key]
        model = self.model
        method = {
            ("encode", False): "encode",
            ("encode", True): "step_encode",
            ("decode", False): "decode",
            ("decode", True): "step_decode",
        }[key]

        def core(variables, x, rng, r2):
            if what == "encode":
                z = model.apply(variables, x, rngs={"noise": rng}, method=method)
                return self.post_process_latent(variables, z, r2)
            zp = self.pre_process_latent(variables, x, r2)
            return model.apply(variables, zp, rngs={"noise": rng}, method=method)

        if streaming:

            def core_st(variables, cache, x, rng, r2):
                v = {**variables, "cache": cache}
                if what == "encode":
                    z, upd = model.apply(
                        v, x, rngs={"noise": rng}, method=method,
                        mutable=["cache", "adain"],
                    )
                    return self.post_process_latent(variables, z, r2), upd
                zp = self.pre_process_latent(variables, x, r2)
                return model.apply(
                    v, zp, rngs={"noise": rng}, method=method,
                    mutable=["cache", "adain"],
                )

            fn = jax.jit(core_st)
        else:
            fn = jax.jit(core)
        self._jitted[key] = fn
        return fn

    def _apply(self, what, x, streaming=False):
        rng, r2 = self._next_rng(), self._next_rng()
        fn = self._get_jitted(what, streaming)
        if streaming:
            out, updated = fn(self.variables, self.cache, x, rng, r2)
            self.cache = updated["cache"]
            if "adain" in updated:
                self.variables = {**self.variables, "adain": updated["adain"]}
            return out
        return fn(self.variables, x, rng, r2)

    def _resample(self, x, direction: str, streaming: bool):
        if self.resampler is None:
            return x
        method = (
            ("step_to_model" if streaming else "to_model_sampling_rate")
            if direction == "in"
            else ("step_from_model" if streaming else "from_model_sampling_rate")
        )
        key = ("resample", method)
        if key not in self._jitted:
            res = self.resampler

            if streaming:

                @jax.jit
                def fn(cache, xx):
                    return res.apply(
                        {"cache": cache}, xx, method=method, mutable=["cache"]
                    )

            else:

                @jax.jit
                def fn(xx):
                    return res.apply({}, xx, method=method)

            self._jitted[key] = fn
        fn = self._jitted[key]
        if streaming:
            y, upd = fn(self._res_cache, x)
            self._res_cache = upd["cache"]
            return y
        return fn(x)

    # ---- public surface --------------------------------------------------
    def encode(self, x, streaming: bool = False):
        """[B, T, C] waveform @ target_sr -> [B, T_lat, latent_size]."""
        if streaming and x.shape[1] % self.block_size != 0:
            raise ValueError(
                f"streaming chunks must be a multiple of block_size="
                f"{self.block_size} (got {x.shape[1]} samples)"
            )
        x = self._resample(x, "in", streaming)
        return self._apply("encode", x, streaming=streaming)

    def decode(self, z, streaming: bool = False):
        """[B, T_lat, latent_size] -> [B, T, C] waveform @ target_sr."""
        fpb = self.manifest["block_size"] // self.cfg.decimation()
        if streaming and z.shape[1] % fpb != 0:
            raise ValueError(
                f"streaming latent chunks must be a multiple of "
                f"{fpb} frames (got {z.shape[1]})"
            )
        y = self._apply("decode", z, streaming=streaming)
        return self._resample(y, "out", streaming)

    def forward(self, x, streaming: bool = False):
        return self.decode(self.encode(x, streaming), streaming)

    @property
    def block_size(self) -> int:
        """Streaming block in *target-rate* samples."""
        b = self.manifest["block_size"]
        return b * self.resampler.ratio if self.resampler else b

    def reset_stream(self):
        # caches are zero-initialized: rebuild from shapes only (no compute)
        self.cache = jax.tree_util.tree_map(
            lambda v: jnp.zeros(v.shape, v.dtype), self.cache
        )
        if self.resampler is not None:
            self._res_cache = jax.tree_util.tree_map(
                lambda v: jnp.zeros(v.shape, v.dtype), self._res_cache
            )

    # ---- AdaIN attributes (reference export.py:306-341) -----------------
    def _set_adain(self, name: str, value: float):
        if "adain" not in self.variables:
            return
        def setleaf(d):
            return jax.tree_util.tree_map_with_path(
                lambda p, v: jnp.full_like(v, value)
                if p[-1].key == name
                else v,
                d,
            )
        self.variables["adain"] = setleaf(self.variables["adain"])

    def set_learn_target(self, on: bool):
        self._set_adain("learn_y", 1.0 if on else 0.0)

    def set_learn_source(self, on: bool):
        self._set_adain("learn_x", 1.0 if on else 0.0)

    def reset_target(self):
        self._set_adain("mean_y", 0.0)
        self._set_adain("std_y", 1.0)
        self._set_adain("num_update_y", 0.0)

    def reset_source(self):
        self._set_adain("mean_x", 0.0)
        self._set_adain("std_x", 1.0)
        self._set_adain("num_update_x", 0.0)
