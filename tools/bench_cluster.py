"""Spectral-clustering backend benchmark: device (TPU) vs host (numpy).

Long recordings produce N ~ 1e4 diarization chunks; the spectral path is
O(N^2) affinity + p-pruning + Laplacian + eigendecomposition. The 'jax'
backend runs all of that on the accelerator (diar/cluster.py:72), leaving
only eigengap selection and k-means on host. This measures wall time for
both backends on synthetic speaker-structured embeddings.

Run from /root/repo (cwd supplies the import path — no PYTHONPATH on TPU):
    python -c "exec(open('tools/bench_cluster.py').read())" [N ...]
"""

import json
import sys
import time

import numpy as np


def synth_embeddings(n, dim=192, spks=8, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((spks, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, spks, n)
    x = centers[labels] * 6.0 + 0.5 * rng.standard_normal((n, dim))
    return x.astype(np.float32), labels


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2048, 8192]

    from speaker3d_tpu.diar.cluster import SpectralCluster

    for n in sizes:
        x, true = synth_embeddings(n)
        row = {"n": n}
        variants = [("lobpcg", dict(backend="jax", eigh_max_n=0)),
                    ("numpy", dict(backend="numpy"))]
        if n <= 4096:  # full dense eigh compile explodes past this
            variants.insert(0, ("eigh", dict(backend="jax",
                                             eigh_max_n=1 << 30)))
        for name, kw in variants:
            sc = SpectralCluster(min_num_spks=1, max_num_spks=15,
                                 pval=0.022, **kw)
            labels = sc(x)  # warm (compile included for jax)
            t0 = time.perf_counter()
            labels = sc(x)
            row[name + "_s"] = round(time.perf_counter() - t0, 3)
            row[name + "_spks"] = int(len(np.unique(labels)))
        row["speedup"] = round(row["numpy_s"] / row["lobpcg_s"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":  # exec(open(...)) in `python -c` hits this too
    main()
