"""Variable-length serving chunk plan — Python mirror of the native
runtime's (runtime/include/s3d/chunk_plan.h; kept in lockstep by
tests/test_export_aot.py::test_chunk_plan_matches_native).

Behavioral contract from the reference's batch inference (reference:
speakerlab/bin/infer_sv_batch.py:388-411): 10 s chunks, 90 s cap, final
partial chunk circle-padded, chunk-embedding mean. Duration buckets
discretize the reference's dynamic ONNX frame axis for AOT serving: the
final partial chunk pads to the SMALLEST bucket that holds it.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence


class ChunkSpec(NamedTuple):
    start: int   # sample offset into the wav
    length: int  # real samples in this chunk
    padded: int  # bucket size to circle-pad to


def plan_chunks(n_samples: int, bucket_samples: Sequence[int],
                max_samples: int) -> List[ChunkSpec]:
    """``bucket_samples``: ascending; the LAST one is the chunk size."""
    plan: List[ChunkSpec] = []
    if n_samples <= 0 or not bucket_samples:
        return plan
    chunk = bucket_samples[-1]
    n = min(n_samples, max_samples)
    for s in range(0, n, chunk):
        length = min(chunk, n - s)
        padded = next((b for b in bucket_samples if b >= length), chunk)
        plan.append(ChunkSpec(s, length, padded))
    return plan


def embed_mean_over_plan(embed_fn, wav, plan: Sequence[ChunkSpec]):
    """Embed each planned chunk (circle-padded) and average — the Python
    path the native AOT engine must match at <= 1e-3 cosine drift."""
    import numpy as np

    from speaker3d_tpu.diar.pipeline import circle_pad

    embs = []
    for c in plan:
        piece = circle_pad(wav[c.start:c.start + c.length], c.padded)
        embs.append(np.asarray(embed_fn(piece[None]))[0])
    return np.mean(np.stack(embs), axis=0)
