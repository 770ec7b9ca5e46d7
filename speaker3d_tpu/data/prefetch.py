"""Device-side batch prefetch: overlap host batch assembly AND the
host->device copy with device compute.

The host input pipeline (data/dataset.py BatchLoader) already overlaps
decode/augment with the train step via worker threads, but two costs were
still serial with compute on the consumer thread: pulling the next batch
out of the loader (host assembly latency when the loader queue is empty)
and the device transfer at dispatch time. `device_prefetch` moves both off
the critical path: a single background thread owns the iterator — it pulls
batches and `jax.device_put`s them (to the given sharding) into a bounded
queue while the device is busy, so step N+1's data is resident when step N
finishes.

This matters most when transfer is slow relative to the step (measured in
docs/BENCH.md: on the tunneled-TPU harness a 49 MB wav batch costs ~1 s to
upload, 13x CAM++'s in-jit step time); on pod hosts it still hides the
PCIe copy. The reference has no analogue (torch DataLoader pins host
memory; the `.cuda(non_blocking=True)` copy serializes with the step
unless a second CUDA stream is used — speakerlab/bin/train.py:141).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional


def device_prefetch(iterator: Iterable, sharding=None, depth: int = 2,
                    mesh=None) -> Iterator:
    """Yield batches from `iterator` as device-resident arrays, keeping up
    to `depth` batches in flight on a background assembly+transfer thread.

    ``sharding``: optional jax sharding applied to every leaf; None puts on
    the default device. ``mesh``: convenience — builds
    ``NamedSharding(mesh, P('data'))`` (the batch-axis sharding every
    trainer here uses) when ``sharding`` is not given.
    Iterator exceptions propagate to the consumer. Safe with early
    termination (break/preemption): the thread is signalled to stop when
    the generator is closed.
    """
    import jax

    if sharding is None and mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        sharding = NamedSharding(mesh, PartitionSpec("data"))

    multihost = jax.process_count() > 1 and sharding is not None

    def _to_device(batch):
        if multihost:
            # each host loaded its 1/process_count share of the global batch
            # (BatchLoader order[rank::count]); assemble the per-host shards
            # into one global array over the mesh (replaces the reference's
            # DistributedSampler per-rank batches, bin/train.py:45-48)
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(sharding, x),
                batch)
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    end = object()
    error: list = [None]

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer went away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in iterator:
                if not _put(_to_device(batch)):
                    return
        except BaseException as e:  # propagate loader errors to consumer
            error[0] = e
        _put(end)

    thread = threading.Thread(target=worker, daemon=True,
                              name="device_prefetch")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is end:
                if error[0] is not None:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
