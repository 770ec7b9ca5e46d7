"""Native UMAP + HDBSCAN backends (diar/umap_native.py, diar/hdbscan_native.py).

The reference's UmapHdbscan path (speakerlab/process/cluster.py:115-137)
depends on external `umap-learn`/`hdbscan`, which are absent here; these
tests validate the in-repo native implementations on synthetic data with
known structure, plus the CommonClustering('umap_hdbscan') dispatch.
"""

import numpy as np
import pytest

from speaker3d_tpu.diar.cluster import CommonClustering, UmapHdbscan
from speaker3d_tpu.diar.hdbscan_native import (
    hdbscan_labels,
    mutual_reachability,
    pairwise_euclidean,
    single_linkage_tree,
)
from speaker3d_tpu.diar.umap_native import find_ab_params, umap_embed


def _blobs(rng, centers, n_per, dim, scale=0.05):
    pts, labs = [], []
    for i, c in enumerate(centers):
        pts.append(c + rng.normal(0.0, scale, (n_per, dim)))
        labs += [i] * n_per
    return np.concatenate(pts), np.array(labs)


def _purity(pred, true):
    """Fraction of points whose predicted cluster's majority true label
    matches their own (noise -1 counts as wrong)."""
    correct = 0
    for c in np.unique(pred):
        if c == -1:
            continue
        members = true[pred == c]
        correct += (members == np.bincount(members).argmax()).sum()
    return correct / len(true)


class TestHdbscanNative:
    def test_blobs_recovered(self):
        rng = np.random.default_rng(0)
        centers = np.eye(8)[:3] * 3.0
        x, true = _blobs(rng, centers, 60, 8)
        labels = hdbscan_labels(x, min_samples=5, min_cluster_size=10)
        found = set(labels) - {-1}
        assert len(found) == 3
        assert _purity(labels, true) > 0.95

    def test_noise_points_marked(self):
        rng = np.random.default_rng(1)
        centers = np.eye(4)[:2] * 4.0
        x, _ = _blobs(rng, centers, 80, 4)
        noise = rng.uniform(-8, 8, (12, 4))
        labels = hdbscan_labels(np.concatenate([x, noise]),
                                min_samples=5, min_cluster_size=10)
        # the uniform outliers should be mostly labelled -1
        assert (labels[-12:] == -1).mean() > 0.5
        assert len(set(labels[:160]) - {-1}) == 2

    def test_min_cluster_size_dissolves_small_groups(self):
        rng = np.random.default_rng(2)
        big, _ = _blobs(rng, [np.zeros(4), np.ones(4) * 5], 50, 4)
        tiny = rng.normal(-5.0, 0.05, (4, 4))  # below min_cluster_size
        labels = hdbscan_labels(np.concatenate([big, tiny]),
                                min_samples=3, min_cluster_size=8)
        assert np.all(labels[-4:] == -1)

    def test_tiny_input_all_noise(self):
        x = np.random.default_rng(3).normal(0, 1, (3, 4))
        assert np.all(hdbscan_labels(x, min_cluster_size=5) == -1)
        assert hdbscan_labels(np.empty((0, 4))).shape == (0,)

    def test_mutual_reachability_properties(self):
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, (20, 3))
        d = pairwise_euclidean(x)
        mr = mutual_reachability(d, min_samples=4)
        assert np.allclose(mr, mr.T)
        assert np.all(mr >= d - 1e-12)
        assert np.all(np.diag(mr) == 0.0)

    def test_single_linkage_tree_shape(self):
        rng = np.random.default_rng(5)
        x = rng.normal(0, 1, (15, 3))
        lin = single_linkage_tree(mutual_reachability(pairwise_euclidean(x), 3))
        assert lin.shape == (14, 4)
        assert lin[-1, 3] == 15  # root contains everything
        assert np.all(np.diff(lin[:, 2]) >= -1e-12)  # sorted merge heights


class TestUmapNative:
    def test_ab_params_min_dist_zero(self):
        a, b = find_ab_params(1.0, 0.0)
        # published values for spread=1, min_dist=0 are approx (1.93, 0.79)
        assert 1.5 < a < 2.4 and 0.6 < b < 1.0

    def test_blob_structure_preserved(self):
        rng = np.random.default_rng(0)
        centers = rng.normal(0, 1, (3, 32)) * 4.0
        x, true = _blobs(rng, centers, 50, 32, scale=0.2)
        y = umap_embed(x, n_neighbors=15, n_components=2, min_dist=0.0,
                       n_epochs=150, seed=0)
        assert y.shape == (150, 2)
        assert np.all(np.isfinite(y))
        # same-blob pairs should be much closer than cross-blob pairs
        within, across = [], []
        for i in range(3):
            m = y[true == i]
            within.append(np.linalg.norm(m - m.mean(0), axis=1).mean())
            for j in range(i + 1, 3):
                across.append(np.linalg.norm(m.mean(0) - y[true == j].mean(0)))
        assert min(across) > 2.0 * max(within)

    def test_degenerate_sizes(self):
        rng = np.random.default_rng(1)
        assert umap_embed(np.empty((0, 8)), n_components=2).shape == (0, 2)
        y = umap_embed(rng.normal(0, 1, (3, 8)), n_components=4)
        assert y.shape == (3, 4)


class TestUmapHdbscanBackend:
    def test_external_backend_unavailable_raises(self):
        pytest.importorskip  # documents intent; external libs absent here
        with pytest.raises(ImportError):
            UmapHdbscan(backend="external")(np.zeros((50, 8)))

    def test_end_to_end_speaker_clusters(self):
        rng = np.random.default_rng(0)
        # synthetic "speaker embeddings": 4 well-separated directions, 192-d
        centers = rng.normal(0, 1, (4, 192))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        x, true = _blobs(rng, centers * 8.0, 40, 192, scale=0.4)
        labels = UmapHdbscan(n_neighbors=15, n_components=8, min_samples=10,
                             min_cluster_size=10)(x)
        found = set(labels) - {-1}
        assert len(found) == 4
        assert _purity(labels, true) > 0.9

    def test_common_clustering_dispatch(self):
        rng = np.random.default_rng(1)
        centers = np.eye(64)[:3] * 6.0
        x, true = _blobs(rng, centers, 40, 64, scale=0.3)
        cc = CommonClustering("umap_hdbscan", cluster_line=40, mer_cos=0.9,
                              min_cluster_size=4, n_neighbors=15,
                              n_components=8, min_samples=8)
        labels = cc(x)
        assert labels.shape == (120,)
        assert len(np.unique(labels)) == 3
        assert _purity(labels, true) > 0.9
