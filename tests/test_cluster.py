import os

import numpy as np

from speaker3d_tpu.diar.cluster import (
    AHCluster,
    CommonClustering,
    SpectralCluster,
    arrange_labels,
    merge_consecutive,
)


def _blobs(sizes=(30, 30, 30), dim=64, seed=0, spread=0.05):
    """Well-separated unit-norm clusters."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((len(sizes), dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    xs, ys = [], []
    for i, n in enumerate(sizes):
        pts = centers[i] + spread * rng.standard_normal((n, dim))
        xs.append(pts)
        ys.append(np.full(n, i))
    return np.concatenate(xs), np.concatenate(ys)


def _purity(labels, truth):
    total = 0
    for lab in np.unique(labels):
        sub = truth[labels == lab]
        total += np.bincount(sub.astype(int)).max()
    return total / len(truth)


def test_ahc_recovers_clusters():
    x, y = _blobs()
    labels = AHCluster(fix_cos_thr=0.5)(x)
    assert len(np.unique(labels)) == 3
    assert _purity(labels, y) == 1.0


def test_spectral_recovers_clusters():
    x, y = _blobs(sizes=(40, 40, 40))
    labels = SpectralCluster(pval=0.05)(x)
    assert len(np.unique(labels)) == 3
    assert _purity(labels, y) == 1.0


def test_spectral_oracle_num():
    x, y = _blobs(sizes=(40, 40))
    labels = SpectralCluster(pval=0.05)(x, speaker_num=2)
    assert len(np.unique(labels)) == 2
    assert _purity(labels, y) == 1.0


def test_common_clustering_trivial_cases():
    cc = CommonClustering("AHC", mer_cos=0.8)
    assert cc(np.zeros((0, 8))).shape == (0,)
    assert (cc(np.ones((1, 8))) == [0]).all()


def test_common_clustering_short_path_uses_ahc():
    x, y = _blobs(sizes=(10, 10), dim=32)
    cc = CommonClustering("spectral", cluster_line=40)
    labels = cc(x)  # 20 < 40 -> AHC path
    assert len(np.unique(labels)) == 2
    assert _purity(labels, y) == 1.0


def test_filter_minor_cluster():
    x, y = _blobs(sizes=(30, 30, 2), dim=32, seed=1)
    cc = CommonClustering("AHC", min_cluster_size=4)
    labels = cc(x)
    # the 2-sample cluster must be absorbed into a major cluster
    assert len(np.unique(labels)) == 2
    sizes = [np.sum(labels == i) for i in np.unique(labels)]
    assert min(sizes) >= 30


def test_merge_by_cos():
    rng = np.random.default_rng(2)
    c = rng.standard_normal(16)
    c /= np.linalg.norm(c)
    a = np.tile(c, (20, 1)) + 0.01 * rng.standard_normal((20, 16))
    b = np.tile(c, (20, 1)) + 0.01 * rng.standard_normal((20, 16))
    x = np.concatenate([a, b + 0.02])
    cc = CommonClustering("AHC", mer_cos=0.5, fix_cos_thr=0.99)
    labels = cc(x)
    # near-identical centroids merged
    assert len(np.unique(labels)) == 1


def test_arrange_labels():
    assert (arrange_labels([5, 5, 2, 7, 2]) == [0, 0, 1, 2, 1]).all()
    assert (arrange_labels([1, 0], start=3) == [3, 4]).all()


def test_merge_consecutive():
    assert merge_consecutive([[0, 1], [0.5, 2], [3, 4]]) == [[0, 2], [3, 4]]


def test_spectral_jax_backend_matches_numpy():
    x, y = _blobs(sizes=(40, 40, 40), seed=5)
    lab_np = SpectralCluster(pval=0.05)(x)
    lab_jax = SpectralCluster(pval=0.05, backend="jax")(x)
    assert _purity(lab_np, y) == 1.0
    assert _purity(lab_jax, y) == 1.0
    assert len(np.unique(lab_jax)) == 3
    # same partition (labels may permute)
    remap = {}
    for a, b in zip(lab_jax, lab_np):
        remap.setdefault(a, b)
        assert remap[a] == b


def test_spectral_jax_lobpcg_matches_numpy():
    """Above eigh_max_n the device backend switches to LOBPCG for the
    k smallest Laplacian eigenpairs (mirrors the reference's eigsh 'SM');
    the partition must match the exact host path."""
    x, y = _blobs(sizes=(60, 60, 60), seed=7)
    lab_np = SpectralCluster(pval=0.05)(x)
    lab_it = SpectralCluster(pval=0.05, backend="jax", eigh_max_n=0)(x)
    assert _purity(lab_it, y) == 1.0
    assert len(np.unique(lab_it)) == len(np.unique(lab_np)) == 3
    remap = {}
    for a, b in zip(lab_it, lab_np):
        remap.setdefault(a, b)
        assert remap[a] == b


def test_spectral_jax_small_n_falls_back_to_eigh():
    """jax lobpcg requires 5k < n; below that the device backend must use
    the sliced full eigh rather than crash (k=16 at max_num_spks=15)."""
    x, y = _blobs(sizes=(30, 30), seed=11)  # n=60 < 5*16
    lab = SpectralCluster(pval=0.05, max_num_spks=15, backend="jax",
                          eigh_max_n=0)(x)
    assert _purity(lab, y) == 1.0
    assert len(np.unique(lab)) == 2


def test_ahc_jax_affinity_matches_numpy():
    """AHC with the device-computed affinity must produce the same
    partition as the float64 host affinity on separated data."""
    from speaker3d_tpu.diar.cluster import AHCluster

    x, y = _blobs(sizes=(50, 50, 50), seed=9)
    lab_np = AHCluster(fix_cos_thr=0.3)(x)
    lab_jx = AHCluster(fix_cos_thr=0.3, backend="jax")(x)
    assert _purity(lab_np, y) == 1.0 and _purity(lab_jx, y) == 1.0
    remap = {}
    for a, b in zip(lab_jx, lab_np):
        remap.setdefault(a, b)
        assert remap[a] == b


def test_min_cluster_ratio_relative_threshold():
    """Relative minor-cluster threshold scales with N (arXiv:2606.08505):
    the same ratio absorbs a small cluster that an absolute size misses."""
    # 3 blobs: 60 + 60 + 8 samples
    x, y = _blobs(sizes=(60, 60, 8), dim=32, seed=4)
    # absolute threshold 4 keeps the 8-sample cluster
    cc_abs = CommonClustering("AHC", min_cluster_size=4)
    labels = cc_abs(x)
    assert len(np.unique(labels)) == 3
    # ratio 0.1 -> effective threshold ceil(12.8) = 13 >= 8: absorbed
    cc_rel = CommonClustering("AHC", min_cluster_size=4,
                              min_cluster_ratio=0.1)
    labels = cc_rel(x)
    assert len(np.unique(labels)) == 2
    sizes = [np.sum(labels == i) for i in np.unique(labels)]
    assert min(sizes) >= 60


def test_spectral_matches_reference_oracle():
    """Label-identical to the reference SpectralCluster (torch repo code run
    directly as oracle; fastcluster/umap/hdbscan stubbed — SpectralCluster
    doesn't use them)."""
    import itertools
    import sys
    import types

    import pytest

    if not os.path.isdir("/root/reference/speakerlab"):
        pytest.skip("reference not available")
    stubbed = [name for name in ("fastcluster", "umap", "hdbscan")
               if name not in sys.modules]
    for name in stubbed:
        sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, "/root/reference")
    try:
        from speakerlab.process.cluster import SpectralCluster as RefSpectral
    finally:
        sys.path.remove("/root/reference")
        for name in stubbed:  # don't leak stubs into later tests
            sys.modules.pop(name, None)
    from speaker3d_tpu.diar.cluster import SpectralCluster as OurSpectral

    rng = np.random.default_rng(0)
    for trial in range(3):
        q, _ = np.linalg.qr(rng.standard_normal((16, 16)))
        sizes = rng.integers(25, 60, size=int(rng.integers(2, 5)))
        x = np.concatenate([q[i] + 0.05 * rng.standard_normal((n, 16))
                            for i, n in enumerate(sizes)])
        ref = RefSpectral(min_num_spks=1, max_num_spks=10, pval=0.022)(x)
        ours = OurSpectral(min_num_spks=1, max_num_spks=10, pval=0.022)(x)
        k_ref, k_ours = len(np.unique(ref)), len(np.unique(ours))
        assert k_ref == k_ours, (trial, k_ref, k_ours)
        assert any(
            np.array_equal(ref, np.asarray([p[l] for l in ours]))
            for p in itertools.permutations(range(k_ours))), trial


def test_ahc_auto_cutover_warns_once(caplog):
    """The auto backend's scipy->nnchain cutover logs a one-time warning so
    hour-scale label drift vs the reference's float64 dendrogram is
    diagnosable (ADVICE r3)."""
    import logging

    from speaker3d_tpu.diar.cluster import AHCluster

    rng = np.random.default_rng(0)
    X = rng.standard_normal((40, 8)).astype(np.float32)
    AHCluster._cutover_warned = False
    c = AHCluster(fix_cos_thr=0.3, backend="auto", auto_nnchain_n=16,
                  cpu_scipy_max_n=24)
    with caplog.at_level(logging.WARNING, logger="speaker3d_tpu"):
        labels = c(X)
        assert labels.shape == (40,)
        warns = [r for r in caplog.records if "AHC auto backend" in r.message]
        assert len(warns) == 1
        caplog.clear()
        c(X)  # second call: warned once already
        assert not [r for r in caplog.records
                    if "AHC auto backend" in r.message]
    AHCluster._cutover_warned = False
