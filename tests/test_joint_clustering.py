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
