"""JointClustering (audio-visual label reconciliation) tests."""

import numpy as np

from speaker3d_tpu.diar.cluster import AHCluster, CommonClustering, JointClustering


class _Conf:
    face_det_stride = 1


def _embs(labels, dim=16, seed=0, spread=0.02):
    rng = np.random.default_rng(seed)
    # orthogonal centers so distinct labels are far apart in cosine
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    centers = {lab: q[i] for i, lab in enumerate(sorted(set(labels)))}
    out = np.stack([centers[lab] + spread * rng.standard_normal(dim)
                    for lab in labels])
    return out / np.linalg.norm(out, axis=1, keepdims=True)


def test_joint_clustering_splits_audio_cluster_by_vision():
    """Audio clustering merges two speakers into one cluster; vision tracks
    separate them -> joint clustering must redistribute."""
    # 12 audio chunks from 2 true speakers, but the audio clusterer
    # under-segments (one cluster); vision sees two distinct face tracks.
    audio_labels = [0] * 6 + [1] * 6
    audioX = _embs(audio_labels, seed=1)
    audioT = [[i * 1.0, i * 1.0 + 1.5] for i in range(12)]

    # vision: 25 fps face frames; speaker A 0-6s, speaker B 6-12s
    visionT = [0.04 * i for i in range(300)]
    vlabels_true = [0 if t < 6 else 1 for t in visionT]
    visionX = _embs(vlabels_true, seed=2)

    jc = JointClustering(lambda X: np.zeros(len(X), int),  # under-segmenting
                         CommonClustering("AHC", fix_cos_thr=0.5))
    labels = jc(audioX, visionX, audioT, visionT, _Conf())
    assert len(labels) == 12
    # chunks fully inside each half should get distinct labels
    first = set(labels[:5])
    second = set(labels[7:])
    assert first.isdisjoint(second), labels


def test_joint_clustering_consistent_when_vision_agrees():
    audio_labels = [0] * 6 + [1] * 6
    audioX = _embs(audio_labels, seed=3)
    audioT = [[i * 1.0, i * 1.0 + 1.5] for i in range(12)]
    visionT = [0.04 * i for i in range(300)]
    vlabels_true = [0 if t < 6 else 1 for t in visionT]
    visionX = _embs(vlabels_true, seed=4)

    jc = JointClustering(AHCluster(fix_cos_thr=0.5), AHCluster(fix_cos_thr=0.5))
    labels = jc(audioX, visionX, audioT, visionT, _Conf())
    assert len(set(labels)) == 2
    assert len(set(labels[:6])) == 1
    assert len(set(labels[6:])) == 1


def test_joint_clustering_matches_reference_oracle():
    """Label-identical to the reference JointClustering run directly
    (reference: process/cluster.py:242-365), with identical injected
    audio/vision clusterers so only the reconciliation logic is compared."""
    import pytest

    from tests.conftest import has_reference

    if not has_reference():
        pytest.skip("reference repo not mounted")
    from tests.test_ref_pipeline_equiv import _import_ref_mod

    _import_ref_mod()  # stubs fastcluster/umap/etc for the import below
    from speakerlab.process.cluster import JointClustering as RefJC

    from speaker3d_tpu.diar.cluster import JointClustering as OurJC

    rng = np.random.default_rng(5)
    d = 16
    centers = rng.standard_normal((3, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    # 24 audio chunks: speaker pattern over time, 1.5 s windows
    aspk = np.array([0, 0, 1, 1, 2, 2] * 4)
    audioX = centers[aspk] + 0.05 * rng.standard_normal((len(aspk), d))
    audioT = [[0.75 * i, 0.75 * i + 1.5] for i in range(len(aspk))]

    # vision: two face tracks covering speakers 0 and 1's spans
    vspk = np.array([0] * 40 + [1] * 40)
    vcenters = rng.standard_normal((2, 8))
    visionX = vcenters[vspk] + 0.05 * rng.standard_normal((len(vspk), 8))
    visionT = ([0.0 + 0.04 * i for i in range(40)]
               + [3.0 + 0.04 * i for i in range(40)])

    class Conf:
        face_det_stride = 1

    audio_cluster = lambda X: aspk.copy()  # noqa: E731 — injected oracle
    vision_cluster = lambda X: vspk.copy()  # noqa: E731

    ref = RefJC(audio_cluster, vision_cluster)(
        audioX, visionX, audioT, visionT, Conf())
    ours = OurJC(audio_cluster, vision_cluster)(
        audioX, visionX, audioT, visionT, Conf())
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))
    assert len(set(np.asarray(ours).tolist())) >= 2
