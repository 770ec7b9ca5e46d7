"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (shard_map/pjit over a Mesh) is validated here without
TPU hardware via virtual CPU devices.

The session environment may register an 'axon' TPU-tunnel PJRT plugin at
interpreter start (sitecustomize) and pin JAX_PLATFORMS=axon. Env vars are
read at jax import (which sitecustomize already did), so we override via
jax.config.update BEFORE any backend is initialized: this forces the CPU
platform, 8 virtual devices, float32 matmul accumulate (this build defaults
to TPU-like bf16 passes even on CPU), and a persistent compilation cache
(XLA-CPU compile times here are erratic; the cache amortizes across runs).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "speakerlab"))
