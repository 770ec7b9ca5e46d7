"""Video diarization pipeline machinery with synthetic detectors."""

import numpy as np

from speaker3d_tpu.diar.video import (
    FaceTrack,
    build_face_tracks,
    embed_tracks,
    tracks_to_vision_inputs,
)


def test_face_tracking_two_faces():
    rng = np.random.default_rng(0)
    H = W = 64
    frames = [rng.integers(0, 255, (H, W)).astype(np.float32)
              for _ in range(20)]
    times = [0.04 * i for i in range(20)]

    def detector(frame):
        # two stationary faces
        return [(5, 5, 20, 20), (35, 35, 20, 20)]

    tracks = build_face_tracks(frames, times, detector)
    assert len(tracks) == 2
    for tr in tracks:
        assert len(tr.frame_times) == 20
        assert tr.crops.shape == (20, 112, 112)


def test_embed_and_flatten():
    tr1 = FaceTrack(0.0, [0.0, 0.04], np.zeros((2, 112, 112)))
    tr2 = FaceTrack(1.0, [1.0, 1.04], np.ones((2, 112, 112)))
    tracks = [tr1, tr2]

    def embedder(crops):
        return np.full((len(crops), 4), crops.mean())

    embed_tracks(tracks, embedder)
    assert tr1.embedding.shape == (4,)
    X, T = tracks_to_vision_inputs(tracks)
    assert X.shape == (4, 4)
    assert T == sorted(T)
