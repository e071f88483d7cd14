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
        raw = (self.path / "params.msgpack").read_bytes()
        self.variables = dict(flax.serialization.from_bytes(dict(template), raw))
        self.cache = self.variables.pop("cache", {})
        self.latent_size = self.manifest["latent_size"]
        self.full_latent_size = self.manifest["full_latent_size"]
        self._rng = jax.random.key(self.manifest.get("seed", 0))

    # ---- latent post/pre processing (per family) ------------------------
    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    def post_process_latent(self, z):
        fam = self.cfg.latent.family
        bufs = self.variables["buffers"]
        if fam == "variational":
            mean, scale = jnp.split(z, 2, axis=-1)
            std = jax.nn.softplus(scale) + 1e-4
            eps = jax.random.normal(self._next_rng(), mean.shape, mean.dtype)
            zs = mean + std * eps
            zs = zs - bufs["latent_mean"]
            zs = zs @ jnp.asarray(bufs["latent_pca"]).T
            return zs[..., : self.latent_size]
        if fam == "discrete":
            # [B, Q, T] indices -> channels-last [B, T, Q]
            idx = self._apply("encode_indices", z)
            return idx.swapaxes(1, 2).astype(jnp.float32)
        if fam == "spherical":
            return blocks.unit_norm_vector_to_angles(z)
        return z  # wasserstein

    def pre_process_latent(self, z):
        fam = self.cfg.latent.family
        bufs = self.variables["buffers"]
        if fam == "variational":
            pad = self.full_latent_size - z.shape[-1]
            noise = jax.random.normal(
                self._next_rng(), z.shape[:-1] + (pad,), z.dtype
            )
            z = jnp.concatenate([z, noise], axis=-1)
            z = z @ jnp.asarray(bufs["latent_pca"])
            return z + bufs["latent_mean"]
        if fam == "discrete":
            idx = jnp.clip(z, 0, self.cfg.latent.codebook_size - 1).astype(jnp.int32)
            # [B, T, Q] -> rvq decode expects [B, Q, T]
            zq = self._apply("decode_indices", idx.swapaxes(1, 2))
            aug = self.cfg.latent.noise_augmentation
            if aug:
                noise = jax.random.normal(
                    self._next_rng(), zq.shape[:-1] + (aug,), zq.dtype
                )
                zq = jnp.concatenate([zq, noise], axis=-1)
            return zq
        if fam == "spherical":
            return blocks.angles_to_unit_norm_vector(z)
        aug = self.cfg.latent.noise_augmentation
        if aug:
            noise = jax.random.normal(
                self._next_rng(), z.shape[:-1] + (aug,), z.dtype
            )
            z = jnp.concatenate([z, noise], axis=-1)
        return z

    def _apply(self, what, *args, streaming=False):
        variables = {**self.variables}
        if streaming:
            variables["cache"] = self.cache
        rngs = {"noise": self._next_rng()}
        if what == "encode":
            method = "step_encode" if streaming else "encode"
        elif what == "decode":
            method = "step_decode" if streaming else "decode"
        elif what == "encode_indices":

            def method(mdl, z):
                # [B, T, D] latents -> [B, Q, T] indices
                return mdl.encoder.encode_indices(z)

        elif what == "decode_indices":

            def method(mdl, idx):
                return mdl.encoder.decode_indices(idx)

        if streaming:
            out, updated = self.model.apply(
                variables, *args, rngs=rngs, method=method, mutable=["cache", "adain"]
            )
            self.cache = updated["cache"]
            if "adain" in updated:
                self.variables["adain"] = updated["adain"]
            return out
        return self.model.apply(variables, *args, rngs=rngs, method=method)

    # ---- public surface --------------------------------------------------
    def encode(self, x, streaming: bool = False):
        """[B, T, C] waveform -> [B, T_lat, latent_size]."""
        z = self._apply("encode", x, streaming=streaming)
        return self.post_process_latent(z)

    def decode(self, z, streaming: bool = False):
        """[B, T_lat, latent_size] -> [B, T, C] waveform."""
        zp = self.pre_process_latent(z)
        return self._apply("decode", zp, streaming=streaming)

    def forward(self, x, streaming: bool = False):
        return self.decode(self.encode(x, streaming), streaming)

    def reset_stream(self):
        x = jnp.zeros((self.stream_batch, self.manifest["block_size"], self.n_channels))
        variables = self.model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
        )
        self.cache = variables.get("cache", {})

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
