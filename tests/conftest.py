"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (shard_map/pjit over a Mesh) is validated here without TPU
hardware, as JAX supports via xla_force_host_platform_device_count. These env
vars must be set before jax initializes its backends.
"""

import os
import sys

# Force-override: the session environment may pin JAX_PLATFORMS to a TPU
# tunnel ('axon'); tests must be hermetic on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
# This jax build defaults to TPU-like reduced (bf16) matmul precision even on
# CPU; parity tests need full float32 accumulate. (The env var is not read by
# this jax version, so set the config programmatically below.)
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: XLA-CPU compile times in this container are
# erratic; cache compiled executables across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (env must be set before this import)

jax.config.update("jax_default_matmul_precision", "float32")

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "speakerlab"))
