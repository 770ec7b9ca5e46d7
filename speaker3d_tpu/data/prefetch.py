"""Device-side batch prefetch: overlap host->device transfer with compute.

The host input pipeline (data/dataset.py BatchLoader) already overlaps
decode/augment with the train step via worker threads, but the batch still
crosses to the device at dispatch time, serial with the previous step's
compute. `device_prefetch` moves that transfer off the critical path: a
single background thread `jax.device_put`s upcoming batches (to the given
sharding) while the device is busy, so step N+1's data is resident when
step N finishes.

This matters most when transfer is slow relative to the step (measured in
docs/BENCH.md: on the tunneled-TPU harness a 49 MB wav batch costs ~1 s to
upload, 13x CAM++'s in-jit step time); on pod hosts it still hides the
PCIe copy. The reference has no analogue (torch DataLoader pins host
memory; the `.cuda(non_blocking=True)` copy serializes with the step
unless a second CUDA stream is used — speakerlab/bin/train.py:141).
"""

from __future__ import annotations

import collections
import concurrent.futures
from typing import Iterable, Iterator, Optional


def device_prefetch(iterator: Iterable, sharding=None,
                    depth: int = 2) -> Iterator:
    """Yield batches from `iterator` as device-resident arrays, keeping up
    to `depth` batches in flight on a background transfer thread.

    ``sharding``: optional jax sharding (e.g. ``NamedSharding(mesh,
    P('data'))``) applied to every leaf; None puts on the default device.
    Safe with early termination (break/preemption): the transfer thread is
    released when the generator is closed.
    """
    import jax

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    it = iter(iterator)
    pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="device_prefetch")
    futures: collections.deque = collections.deque()

    def submit_next() -> bool:
        try:
            batch = next(it)
        except StopIteration:
            return False
        futures.append(pool.submit(put, batch))
        return True

    try:
        for _ in range(max(1, depth)):
            if not submit_next():
                break
        while futures:
            out = futures.popleft().result()
            submit_next()
            yield out
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
