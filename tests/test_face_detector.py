"""In-repo trainable face detector + video-vision upgrades (VERDICT r1
item 9): bilinear crop resize, track-quality filtering, and the tiny
center-heatmap detector trained on rendered faces, then driven through the
real tracking pipeline on rendered MOVING faces.

Reference equivalents: version-RFB-320/fqa ONNX assets
(egs/3dspeaker/speaker-diarization/run_video.sh:47-52) — external downloads
this container cannot make.
"""

import os

import numpy as np
import pytest
import yaml


def _iou(a, b):
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    x1, y1 = max(ax, bx), max(ay, by)
    x2, y2 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    return inter / (aw * ah + bw * bh - inter + 1e-9)


def test_resize_bilinear_matches_cv2():
    import cv2

    from speaker3d_tpu.diar.video import resize_bilinear

    rng = np.random.default_rng(0)
    patch = rng.uniform(0, 255, (37, 53)).astype(np.float32)
    ours = resize_bilinear(patch, 24)
    ref = cv2.resize(patch, (24, 24), interpolation=cv2.INTER_LINEAR)
    assert ours.shape == (24, 24)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_quality_filter_drops_blurred_tracks():
    from speaker3d_tpu.diar.video import crop_sharpness

    rng = np.random.default_rng(1)
    sharp = rng.uniform(0, 255, (4, 32, 32)).astype(np.float32)
    blurred = np.full((4, 32, 32), 128.0, np.float32) \
        + 0.5 * rng.standard_normal((4, 32, 32))
    assert crop_sharpness(sharp) > 100 * crop_sharpness(blurred)


def test_gaussian_heatmap_and_decode_roundtrip():
    from speaker3d_tpu.models.face_detector import (
        decode_detections,
        gaussian_heatmap,
    )

    boxes = [(40, 24, 32, 40), (120, 80, 40, 48)]
    heat, size, mask = gaussian_heatmap(144, 192, boxes)
    assert mask.sum() == 2
    # perfect-prediction decode recovers the boxes
    logits = np.log(np.maximum(heat, 1e-6)) - np.log(
        np.maximum(1 - heat, 1e-6))
    dets = decode_detections(logits, size, threshold=0.5)
    assert len(dets) == 2
    matched = [max(_iou(d, b) for b in boxes) for d in dets]
    assert min(matched) > 0.6, matched


@pytest.fixture(scope="module")
def detector_exp(tmp_path_factory):
    from speaker3d_tpu.cli.train_face_detector import main as train_main

    root = str(tmp_path_factory.mktemp("face_det"))
    exp_dir = os.path.join(root, "exp")
    cfg = {"exp_dir": exp_dir, "height": 144, "width": 192,
           "batch_size": 16, "step_per_epoch": 16, "num_epoch": 40,
           "max_lr": 2e-3, "warmup_epoch": 1,
           "model": {"args": {"channels": 16}}}
    p = os.path.join(root, "cfg.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config", p])
    return exp_dir


def test_trained_detector_finds_rendered_faces(detector_exp):
    from speaker3d_tpu.data.synthetic_faces import render_frame
    from speaker3d_tpu.models.face_detector import load_face_detector_exp

    detector = load_face_detector_exp(detector_exp, threshold=0.3)
    rng = np.random.default_rng(77)
    hits = total = 0
    false_pos = 0
    for _ in range(8):
        frame, boxes = render_frame(rng)
        dets = detector(frame)
        for b in boxes:
            total += 1
            if any(_iou(d, b) > 0.4 for d in dets):
                hits += 1
        false_pos += sum(1 for d in dets
                         if all(_iou(d, b) <= 0.2 for b in boxes))
    assert hits / total >= 0.75, (hits, total)
    assert false_pos <= total, (false_pos, total)


def test_tracking_on_rendered_moving_faces(detector_exp):
    """The full no-ONNX vision path: rendered moving faces -> trained
    detector -> IoU tracking -> quality filter."""
    from speaker3d_tpu.data.synthetic_faces import render_moving_face_video
    from speaker3d_tpu.diar.video import build_face_tracks
    from speaker3d_tpu.models.face_detector import load_face_detector_exp

    detector = load_face_detector_exp(detector_exp, threshold=0.3)
    rng = np.random.default_rng(5)
    frames, boxes_seq = render_moving_face_video(rng, n_frames=24,
                                                 n_faces=2)
    times = [i * 0.04 for i in range(len(frames))]
    tracks = build_face_tracks(frames, times, detector, min_quality=1.0)
    assert 1 <= len(tracks) <= 4, len(tracks)  # 2 faces, tolerate splits
    # tracks must persist across a meaningful time span with crops resized
    longest = max(tracks, key=lambda t: len(t.frame_times))
    assert len(longest.frame_times) >= 10
    assert longest.crops.shape[1:] == (112, 112)
