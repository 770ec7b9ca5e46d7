"""AHC backend benchmark: NN-chain (host / device) vs exact scipy.

AHC is the fork's DEFAULT diarization clustering (reference:
process/cluster.py:139-156, fastcluster average linkage) and was the
scaling cliff of its own pipeline: the condensed -cos matrix is O(N^2)
float64 (1 GB at N=16k; ~4.3 GB at 32k plus the 8.6 GB dense affinity
that produces it). The NN-chain backends (diar/ahc_nnchain.py) represent
clusters as (sum-vector, size) — O(N d) memory — and the device variant
builds the whole dendrogram in ONE jit dispatch.

Measures warm wall time per backend and checks the partitions agree.

Run from /root/repo (cwd supplies the import path — no PYTHONPATH on TPU):
    python -c "exec(open('tools/bench_ahc.py').read())" [N ...]
Default sizes 4096 8192 16384 32768; scipy is skipped above 8192 (memory)
unless SCIPY_MAX is raised via the 2nd env knob below.
"""

import json
import os
import sys
import time

import numpy as np

SCIPY_MAX = int(os.environ.get("AHC_SCIPY_MAX", 8192))
HOST_MAX = int(os.environ.get("AHC_HOST_MAX", 16384))
THR = 0.3  # fork default fix_cos_thr (reference: bin/infer_diarization.py)


def synth_embeddings(n, dim=192, spks=8, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((spks, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, spks, n)
    x = centers[labels] * 6.0 + 0.5 * rng.standard_normal((n, dim))
    return x.astype(np.float32), labels


def _partition_sizes(labels):
    return sorted(np.bincount(np.asarray(labels).astype(int)).tolist())


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384, 32768]

    from speaker3d_tpu.diar.ahc_nnchain import (
        device_linkage_labels,
        linkage_labels,
    )
    from speaker3d_tpu.diar.cluster import AHCluster

    for n in sizes:
        x, _ = synth_embeddings(n)
        row = {"n": n}
        parts = {}

        # device NN-chain (compile once per (n, d), then timed warm)
        labels = device_linkage_labels(x, THR)
        t0 = time.perf_counter()
        labels = device_linkage_labels(x, THR)
        row["device_s"] = round(time.perf_counter() - t0, 3)
        parts["device"] = _partition_sizes(labels)

        if n <= HOST_MAX:
            t0 = time.perf_counter()
            labels = linkage_labels(x, THR)
            row["host_nnchain_s"] = round(time.perf_counter() - t0, 3)
            parts["host"] = _partition_sizes(labels)

        if n <= SCIPY_MAX:
            ahc = AHCluster(fix_cos_thr=THR, backend="numpy")
            t0 = time.perf_counter()
            labels = ahc(x)
            row["scipy_s"] = round(time.perf_counter() - t0, 3)
            parts["scipy"] = _partition_sizes(labels)
            row["speedup_vs_scipy"] = round(
                row["scipy_s"] / row["device_s"], 2)

        row["partitions_agree"] = len({tuple(v) for v in parts.values()}) == 1
        row["clusters"] = len(parts["device"])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
