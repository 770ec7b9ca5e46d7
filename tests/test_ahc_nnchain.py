"""NN-chain average-linkage AHC vs the exact scipy path.

The linkage is reducible, so NN-chain must produce the same dendrogram —
the flat-cut partitions must match scipy's (label numbering differs:
fcluster numbers by dendrogram traversal, NN-chain by first appearance).
(reference: process/cluster.py:139-156 — fastcluster average linkage.)
"""

import numpy as np
import pytest

from speaker3d_tpu.diar.ahc_nnchain import (
    device_linkage_labels,
    linkage_labels,
)
from speaker3d_tpu.diar.cluster import AHCluster


def _partition(labels):
    groups = {}
    for i, l in enumerate(labels):
        groups.setdefault(int(l), []).append(i)
    return sorted(tuple(v) for v in groups.values())


def _embs(rng, n, n_spk=8, d=64):
    centers = rng.standard_normal((n_spk, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, n_spk, n)
    x = centers[lab] + 0.15 * rng.standard_normal((n, d))
    return x.astype(np.float32)


def _scipy_labels(x, thr):
    return AHCluster(fix_cos_thr=thr, backend="numpy")(x)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [37, 256, 1024])
def test_host_nnchain_matches_scipy(seed, n):
    rng = np.random.default_rng(seed)
    x = _embs(rng, n)
    for thr in (0.2, 0.4, 0.6):
        ours = linkage_labels(x, thr)
        ref = _scipy_labels(x, thr)
        assert _partition(ours) == _partition(ref), (n, thr)


@pytest.mark.slow
def test_host_nnchain_matches_scipy_4k():
    rng = np.random.default_rng(3)
    x = _embs(rng, 4096, n_spk=12)
    ours = linkage_labels(x, 0.4)
    ref = _scipy_labels(x, 0.4)
    assert _partition(ours) == _partition(ref)


@pytest.mark.parametrize("n", [50, 600])
def test_device_nnchain_matches_host(n):
    rng = np.random.default_rng(7)
    x = _embs(rng, n)
    for thr in (0.3, 0.5):
        dev = device_linkage_labels(x, thr)
        host = linkage_labels(x, thr)
        assert _partition(dev) == _partition(host), (n, thr)


def test_auto_backend_dispatch():
    """auto = exact scipy at small N; NN-chain above the cutover (host on
    CPU). Both must agree on well-separated blobs regardless of path."""
    rng = np.random.default_rng(11)
    x = _embs(rng, 300, n_spk=4)
    small = AHCluster(fix_cos_thr=0.4, backend="auto")(x)
    assert _partition(small) == _partition(_scipy_labels(x, 0.4))

    # tight blobs (noise norm ~0.4 << unit centers: within-cos ~0.86,
    # cross ~0) so the count is threshold-robust
    centers = rng.standard_normal((4, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, 4, 4200)
    big = (centers[lab]
           + 0.05 * rng.standard_normal((4200, 64))).astype(np.float32)
    auto = AHCluster(fix_cos_thr=0.4, backend="auto", auto_nnchain_n=1024)
    labels = auto(big)
    # 4 well-separated blobs must come back as 4 clusters either way
    assert len(set(labels.tolist())) == 4


def test_degenerate_inputs():
    assert linkage_labels(np.zeros((0, 8)), 0.4).shape == (0,)
    assert linkage_labels(np.ones((1, 8)), 0.4).tolist() == [0]
    assert device_linkage_labels(np.ones((1, 8)), 0.4).tolist() == [0]
    # two identical rows merge at -cos = -1 <= cut for any thr in (0, 1]
    two = np.tile(np.ones((1, 8), np.float32), (2, 1))
    assert linkage_labels(two, 0.9).tolist() == [0, 0]
