import os
import sys

# Tests always run on a virtual 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware (SURVEY.md §2.13). Force CPU even
# when the environment pins a hardware backend, and drop any sitecustomize
# plugin path whose PJRT registration would freeze the device count.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache makes repeated CI runs fast; keyed by whether a
# hardware-plugin sitecustomize is active — executables AOT-compiled in one
# environment mis-detect CPU features in the other (observed numerical
# corruption when shared)
_suffix = "_plugin" if ".axon_site" in os.environ.get("PYTHONPATH", "") else ""
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", f".jax_cache_cpu{_suffix}"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# A plugin sitecustomize may have latched a hardware backend before this
# file runs, ignoring the JAX_PLATFORMS env var — but the config update
# still wins if applied before first device use, restoring the fast
# virtual 8-device CPU mesh. Pin matmul precision too: the equivalence
# oracles assume fp32-exact matmuls on any backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# XLA:CPU's backend optimization passes dominate suite wall time on small
# boxes (CI_RUNS: ~57 min, almost all compiles). The tests exercise tiny
# models where optimized runtime is irrelevant, so default to the fast
# compile path; RAVE_TPU_TEST_FAST=0 restores full optimization (numeric
# oracles are tolerance- or self-consistency-based, so both modes pass —
# see CI_RUNS round-5 A/B).
os.environ.setdefault("RAVE_TPU_TEST_FAST", "1")  # children inherit
if os.environ["RAVE_TPU_TEST_FAST"] != "0":
    jax.config.update("jax_disable_most_optimizations", True)
    # fast-mode executables must not poison the optimized cache
    os.environ["JAX_COMPILATION_CACHE_DIR"] = (
        os.environ["JAX_COMPILATION_CACHE_DIR"].rstrip("/") + "_fast"
    )
