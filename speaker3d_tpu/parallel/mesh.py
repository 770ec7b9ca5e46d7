"""Device mesh construction and sharding helpers.

The framework's parallelism surface (SURVEY.md §2.6 TPU-native mapping):
  - ``data`` axis: batch data-parallelism (gradients psum over ICI/DCN) —
    replaces the reference's DDP/NCCL (reference: bin/train.py:34-60).
  - ``model`` axis: vocab-parallel classifier sharding for the AAM-softmax
    (class counts scale with corpus speakers) — the one tensor-parallel
    shard point that pays off for <60M-param backbones.
Multi-host: jax.distributed initialization + per-host file sharding by
process_index replaces the reference's ``rank::world`` round-robin
(reference: bin/extract.py:67, bin/infer_diarization.py:924).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Mesh over ('data', 'model'); data axis defaults to all remaining."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def model_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, P(*(("model",) + (None,) * (ndim - 1))))


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host pods (replaces torchrun
    process-group init, reference: bin/train.py:34). No-ops on single host /
    when already initialized; env vars (JAX_COORDINATOR_ADDRESS, ...) are
    used when arguments are omitted."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        pass  # single-host run without coordinator configuration


def process_rank() -> int:
    """The shard identity used by process_shard: SPEAKER3D_PROC_INDEX when
    fan-out set it, else jax.process_index(). Use this (not
    jax.process_index()) to name per-rank output files."""
    import os

    return int(os.environ.get("SPEAKER3D_PROC_INDEX", jax.process_index()))


def process_shard(items, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Round-robin shard of a host-side work list by process.
    (reference: rank::world file sharding, bin/extract.py:67)

    Rank resolution precedence: explicit arguments > SPEAKER3D_PROC_INDEX /
    SPEAKER3D_PROC_COUNT env vars (set by local --nprocs fan-out, mirroring
    the reference's mp.spawn rank::nprocs, bin/infer_diarization.py:924) >
    jax process index (multi-host pods).
    """
    import os

    if process_index is None:
        process_index = int(os.environ.get("SPEAKER3D_PROC_INDEX",
                                           jax.process_index()))
    if process_count is None:
        process_count = int(os.environ.get("SPEAKER3D_PROC_COUNT",
                                           jax.process_count()))
    return list(items)[process_index::process_count]
