"""rave_tpu — a TPU-native neural audio codec framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of acids-ircam/RAVE
(reference layer map: /root/reference, see SURVEY.md). The compute path is
jax + flax.linen modules compiled with jit/pjit over a `jax.sharding.Mesh`;
streaming inference is expressed as explicit per-layer state (flax 'cache'
collections) rather than hidden conv buffers.

Public surface (mirrors the reference's capabilities):
  - rave_tpu.ops      : trace-free DSP (PQMF, multiscale STFT, mel, resampler)
  - rave_tpu.nn       : dual-mode (offline/streaming) conv runtime with static
                        delay algebra (the cached_conv equivalent)
  - rave_tpu.models   : encoder/generator blocks, latent families, RAVE model,
                        discriminators, autoregressive latent prior
  - rave_tpu.train    : training loop, schedules, EMA, checkpointing
  - rave_tpu.data     : preprocessing + host-side input pipeline
  - rave_tpu.config   : composable preset/override config system (gin-like)
  - rave_tpu.export   : streaming-artifact export (the nn_tilde equivalent)
"""

from rave_tpu.version import __version__

__all__ = ["__version__"]
