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


def balanced_devices(n_total: int):
    """The first n_total/process_count devices OF EACH process, in process
    order. ``jax.devices()[:n]`` takes process 0's devices first, so on a
    pod a truncated mesh could leave some hosts owning zero rows — which
    breaks per-host batch assembly (make_array_from_process_local_data
    needs every process to address part of the sharding). Use this whenever
    a mesh spans fewer than all devices on a multi-process run."""
    n_proc = jax.process_count()
    if n_total % n_proc:
        raise ValueError(f"{n_total} mesh devices not divisible by "
                         f"{n_proc} processes")
    per = n_total // n_proc
    by_proc: dict = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    out = []
    for p in sorted(by_proc):
        if len(by_proc[p]) < per:
            raise ValueError(f"process {p} has {len(by_proc[p])} devices, "
                             f"needs {per}")
        out.extend(by_proc[p][:per])
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def model_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, P(*(("model",) + (None,) * (ndim - 1))))


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for multi-host pods (replaces torchrun
    process-group init, reference: bin/train.py:34).

    Called at the top of every CLI ``main()``. Resolution order for each
    field: explicit argument > ``SPEAKER3D_*`` env > ``JAX_*`` env. When no
    coordinator is configured anywhere this is a no-op (single-host run) and
    — critically — does NOT touch the XLA backend, so a later explicit
    ``jax.distributed.initialize`` by the caller still works. When a
    coordinator IS configured, initialization failures propagate: silently
    degrading a pod run to N independent single-host runs double-writes
    checkpoints and shards nothing.

    Returns True iff jax.distributed is initialized after the call.
    """
    import os

    if jax.distributed.is_initialized():
        return True

    def _env(name: str) -> Optional[str]:
        return (os.environ.get("SPEAKER3D_" + name)
                or os.environ.get("JAX_" + name) or None)

    if coordinator_address is None:
        coordinator_address = _env("COORDINATOR_ADDRESS")
    if num_processes is None:
        v = _env("NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = _env("PROCESS_ID")
        process_id = int(v) if v else None

    if coordinator_address is None:
        # No explicit coordinator. Real pods/clusters still auto-detect:
        # jax.distributed.initialize() with no args resolves SLURM / Open
        # MPI / Cloud-TPU-pod environments. Only attempt it when one of
        # those is recognizably present — otherwise a plain single-host
        # run must not touch the backend at all.
        cluster_env = (
            os.environ.get("SLURM_JOB_ID")
            or os.environ.get("OMPI_COMM_WORLD_SIZE")
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
            # Cloud-TPU pod: both vars present (a lone TPU_WORKER_HOSTNAMES
            # is also set by this harness's single-chip tunnel shim)
            or (os.environ.get("TPU_WORKER_ID")
                and os.environ.get("TPU_WORKER_HOSTNAMES")))
        if not cluster_env:
            return False  # single-host: never probe or init the backend
        jax.distributed.initialize()  # auto-detect; failures propagate
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


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
