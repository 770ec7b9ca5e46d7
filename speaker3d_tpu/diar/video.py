"""Audio-visual diarization: vision processing pipeline + joint clustering.

Behavioral contract (reference: egs/3dspeaker/speaker-diarization/
run_video.sh + local/vision_processer.py:30): extract 25 fps frames + 16 kHz
audio, detect/track faces per scene, score active speech per track with
TalkNet-style ASD, compute face-recognition embeddings for active tracks,
then reconcile audio clusters with vision tracks via JointClustering
(process/cluster.py:242).

The reference's face detector / quality / recognition models are external
ONNX assets (version-RFB-320, fqa, face_recog_ir101); this pipeline takes
them as callables so any implementation plugs in:

  face_detector(frame_gray [H, W])      -> list of (x, y, w, h)
  face_embedder(face_crops [N, h, w])   -> [N, D] embeddings
  asd_scorer(audio_mfcc, face_crops)    -> per-frame speech scores

``asd_scorer`` defaults to the TPU TalkNet model when variables are given.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import numpy as np


def resize_bilinear(patch: np.ndarray, size: int) -> np.ndarray:
    """Vectorized numpy bilinear resize to [size, size] (cv2-free; replaces
    the r1 nearest-neighbour fallback — reference crops go through cv2's
    bilinear, local/vision_processer.py)."""
    h, w = patch.shape[:2]
    if h == 0 or w == 0:
        return np.zeros((size, size), patch.dtype)
    # cv2's pixel-center alignment: sample at (i + 0.5) * scale - 0.5
    fy = np.clip((np.arange(size) + 0.5) * (h / size) - 0.5, 0, h - 1)
    fx = np.clip((np.arange(size) + 0.5) * (w / size) - 0.5, 0, w - 1)
    y0 = np.floor(fy).astype(int)
    x0 = np.floor(fx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None]
    wx = (fx - x0)[None, :]
    p = patch.astype(np.float32)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def crop_sharpness(crops: np.ndarray) -> float:
    """Mean variance-of-Laplacian over a track's crops — the in-repo
    stand-in for the reference's fqa.onnx face-quality scores: blurred /
    featureless crops (occlusions, motion blur, mis-tracks) score low."""
    p = crops.astype(np.float32)
    lap = (p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2]
           + p[:, 1:-1, 2:] - 4.0 * p[:, 1:-1, 1:-1])
    return float(np.mean(np.var(lap.reshape(lap.shape[0], -1), axis=1)))


@dataclasses.dataclass
class FaceTrack:
    """A contiguous single-face track."""

    start_time: float
    frame_times: List[float]
    crops: np.ndarray          # [T, H, W] grayscale face crops
    asd_scores: Optional[np.ndarray] = None
    embedding: Optional[np.ndarray] = None

    @property
    def end_time(self):
        return self.frame_times[-1] if self.frame_times else self.start_time


def build_face_tracks(frames: Sequence[np.ndarray], frame_times: Sequence[float],
                      face_detector: Callable, iou_threshold: float = 0.5,
                      crop_size: int = 112,
                      min_quality: float = 0.0) -> List[FaceTrack]:
    """Greedy IoU tracking of detections across frames.
    (reference: local/vision_processer.py scene face tracking)

    ``min_quality``: drop finished tracks whose mean crop sharpness
    (crop_sharpness, the fqa.onnx stand-in) falls below this value."""

    def iou(a, b):
        ax, ay, aw, ah = a
        bx, by, bw, bh = b
        x1, y1 = max(ax, bx), max(ay, by)
        x2, y2 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
        inter = max(0, x2 - x1) * max(0, y2 - y1)
        union = aw * ah + bw * bh - inter
        return inter / union if union > 0 else 0.0

    def crop(frame, box):
        x, y, w, h = [int(v) for v in box]
        h_img, w_img = frame.shape[:2]
        x, y = max(0, x), max(0, y)
        patch = frame[y:min(y + h, h_img), x:min(x + w, w_img)]
        if patch.size == 0:
            patch = np.zeros((crop_size, crop_size), frame.dtype)
        return resize_bilinear(patch, crop_size)

    active: List[dict] = []
    done: List[FaceTrack] = []
    for frame, t in zip(frames, frame_times):
        dets = list(face_detector(frame))
        matched = set()
        for tr in active:
            best, best_iou = None, iou_threshold
            for di, d in enumerate(dets):
                if di in matched:
                    continue
                v = iou(tr["box"], d)
                if v >= best_iou:
                    best, best_iou = di, v
            if best is not None:
                matched.add(best)
                tr["box"] = dets[best]
                tr["times"].append(t)
                tr["crops"].append(crop(frame, dets[best]))
                tr["miss"] = 0
            else:
                tr["miss"] += 1
        still = []
        for tr in active:
            if tr["miss"] > 10:
                done.append(FaceTrack(tr["times"][0], tr["times"],
                                      np.stack(tr["crops"])))
            else:
                still.append(tr)
        active = still
        for di, d in enumerate(dets):
            if di not in matched:
                active.append({"box": d, "times": [t],
                               "crops": [crop(frame, d)], "miss": 0})
    for tr in active:
        done.append(FaceTrack(tr["times"][0], tr["times"],
                              np.stack(tr["crops"])))
    done = [t for t in done if len(t.frame_times) >= 3]
    if min_quality > 0.0:
        done = [t for t in done if crop_sharpness(t.crops) >= min_quality]
    return done


def score_tracks_asd(tracks: List[FaceTrack], audio_mfcc: np.ndarray,
                     asd_scorer: Callable, fps: float = 25.0,
                     mfcc_hop_s: float = 0.01) -> None:
    """Attach per-frame active-speech scores to each track.

    The audio slice is taken by TRUE track time (the reference's
    ``t0*4`` indexing assumes 25 fps / 10 ms hop); scorers consume exactly
    4 MFCC frames per visual frame (the TalkNet contract). Each crop's
    4-frame window is anchored at that crop's OWN frame time — tracks may
    contain detection gaps (build_face_tracks keeps a track alive across
    up to 10 missed frames without appending crops), so an evenly spaced
    4:1 grid over the span would misalign audio after any gap.
    """
    for tr in tracks:
        n = len(tr.frame_times)
        span_s = (tr.frame_times[-1] - tr.start_time) + 1.0 / fps
        start = int(round(tr.start_time / mfcc_hop_s))
        dur = max(4, int(round(span_s / mfcc_hop_s)))
        a = audio_mfcc[start:start + dur]
        if a.shape[0] < dur:
            a = np.pad(a, ((0, dur - a.shape[0]), (0, 0)))
        rel = (np.asarray(tr.frame_times) - tr.start_time) / mfcc_hop_s
        base = np.clip(np.round(rel).astype(int), 0, dur - 4)
        idx = (base[:, None] + np.arange(4)[None, :]).reshape(-1)
        tr.asd_scores = np.asarray(asd_scorer(a[idx], tr.crops))


def embed_tracks(tracks: List[FaceTrack], face_embedder: Callable,
                 active_threshold: float = 0.0) -> None:
    for tr in tracks:
        if tr.asd_scores is not None:
            keep = tr.asd_scores > active_threshold
            crops = tr.crops[keep] if keep.any() else tr.crops
        else:
            crops = tr.crops
        embs = np.asarray(face_embedder(crops))
        tr.embedding = embs.mean(axis=0)


def tracks_to_vision_inputs(tracks: List[FaceTrack]):
    """-> (visionX [N, D], visionT [N]) flattened per-frame for
    JointClustering (frames of a track share its embedding)."""
    visionX, visionT = [], []
    for ti, tr in enumerate(tracks):
        for t in tr.frame_times:
            visionX.append(tr.embedding)
            visionT.append(t)
    order = np.argsort(visionT)
    return (np.stack(visionX)[order] if visionX else np.zeros((0, 1)),
            list(np.asarray(visionT)[order]))


def make_talknet_asd_scorer(variables, model=None):
    """Default ASD scorer backed by the TPU TalkNet model."""
    import jax

    from speaker3d_tpu.models.talknet import TalkNetModel

    model = model or TalkNetModel()

    @jax.jit
    def run(audio, faces):
        av, _, _ = model.apply(variables, audio[None], faces[None])
        return jax.nn.softmax(av, axis=-1)[0, :, 1]

    def scorer(audio_mfcc, face_crops):
        return np.asarray(run(audio_mfcc.astype(np.float32),
                              face_crops.astype(np.float32)))

    return scorer
