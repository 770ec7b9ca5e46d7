"""Audio-visual diarization driver.

Behavioral contract (reference: egs/3dspeaker/speaker-diarization/
run_video.sh + local/vision_processer.py + local/cluster_and_postprocess.py
:76-101): extract frames (25 fps) + 16 kHz audio from the video, track
faces per scene, score active speech per track (ASD), embed active tracks,
run the audio diarization, then reconcile audio clusters against vision
tracks with JointClustering and write RTTM.

External-model policy: the reference downloads four ONNX vision models
(face det version-RFB-320, asd.onnx, fqa.onnx, face_recog_ir101). This
driver keeps those pluggable (zero egress here):
  --yunet_onnx        cv2.FaceDetectorYN model file for detection
  --face_boxes_json   precomputed per-frame boxes {frame_idx: [[x,y,w,h],..]}
  --face_embed_onnx   cv2.dnn face-recognition model (112x112 input)
  --asd_exp_dir       a trained TalkNet experiment (cli/train_asd.py)
With none given, detection REQUIRES one of the first two; embedding falls
back to normalized downsampled pixels and ASD to an audio-energy heuristic —
functional, clearly weaker than trained models.

Audio is read from --wav when given, else extracted with ffmpeg (gated on
the binary being present).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Audio-visual speaker diarization")
    p.add_argument("--video", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--wav", default=None,
                   help="16 kHz audio for the video (else ffmpeg extracts it)")
    p.add_argument("--model_id",
                   default="iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common")
    p.add_argument("--local_model_dir", default="pretrained")
    p.add_argument("--exp_dir", default=None)
    p.add_argument("--fps", type=float, default=25.0)
    p.add_argument("--yunet_onnx", default=None)
    p.add_argument("--face_boxes_json", default=None)
    p.add_argument("--face_detector_exp_dir", default=None,
                   help="in-repo trained detector "
                        "(cli/train_face_detector.py) — the no-ONNX path")
    p.add_argument("--face_threshold", type=float, default=0.35)
    p.add_argument("--face_min_quality", type=float, default=0.0,
                   help="drop tracks whose mean crop sharpness "
                        "(variance-of-Laplacian, the fqa.onnx stand-in) "
                        "is below this")
    p.add_argument("--face_embed_onnx", default=None)
    p.add_argument("--asd_exp_dir", default=None)
    p.add_argument("--speaker_num", type=int, default=None)
    p.add_argument("--vad_threshold", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=64)
    return p.parse_args(argv)


def extract_audio(video: str, fs: int = 16000) -> str:
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            "ffmpeg not found: pass --wav with the video's 16 kHz audio "
            "(reference extracts it with ffmpeg, run_video.sh:41-45)")
    out = tempfile.NamedTemporaryFile(suffix=".wav", delete=False).name
    subprocess.run(["ffmpeg", "-y", "-i", video, "-ac", "1", "-ar", str(fs),
                    "-loglevel", "error", out], check=True)
    return out


def read_frames(video: str, fps: float):
    """Stream (source_frame_idx, time_s, grayscale frame) sampled at ~fps.

    A generator so hour-scale videos never materialize all frames; only
    tracked face crops persist (reference vision_processer streams per
    scene for the same reason).
    """
    import cv2

    cap = cv2.VideoCapture(video)
    if not cap.isOpened():
        raise RuntimeError(f"cv2 cannot open {video}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    step = max(1, int(round(src_fps / fps)))
    idx = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % step == 0:
                yield idx, idx / src_fps, cv2.cvtColor(frame,
                                                       cv2.COLOR_BGR2GRAY)
            idx += 1
    finally:
        cap.release()


def build_face_detector(args, src_idx_iter=None):
    """``src_idx_iter`` yields the SOURCE frame index of each sampled frame
    (in lockstep with the tracking loop) so precomputed --face_boxes_json
    tables keyed by source index stay correct when frames are decimated."""
    if args.face_boxes_json:
        with open(args.face_boxes_json) as f:
            table = {int(k): v for k, v in json.load(f).items()}

        def detector(frame):
            idx = next(src_idx_iter)
            return [tuple(b) for b in table.get(idx, [])]

        return detector
    if args.yunet_onnx:
        import cv2

        det = cv2.FaceDetectorYN_create(args.yunet_onnx, "", (320, 320))

        def detector(frame):
            import cv2 as _cv2

            h, w = frame.shape[:2]
            det.setInputSize((w, h))
            bgr = _cv2.cvtColor(frame, _cv2.COLOR_GRAY2BGR)
            _, faces = det.detect(bgr)
            if faces is None:
                return []
            return [tuple(f[:4]) for f in faces]

        return detector
    if args.face_detector_exp_dir:
        from speaker3d_tpu.models.face_detector import load_face_detector_exp

        return load_face_detector_exp(args.face_detector_exp_dir,
                                      threshold=args.face_threshold)
    raise RuntimeError("no face detector: pass --face_detector_exp_dir "
                       "(train one with cli/train_face_detector.py), "
                       "--yunet_onnx, or --face_boxes_json (reference "
                       "downloads version-RFB-320 from modelscope)")


def build_face_embedder(args):
    if args.face_embed_onnx:
        import cv2

        net = cv2.dnn.readNetFromONNX(args.face_embed_onnx)

        def embedder(crops):
            out = []
            for c in crops:
                blob = cv2.dnn.blobFromImage(
                    cv2.cvtColor(c.astype(np.uint8), cv2.COLOR_GRAY2BGR),
                    1.0 / 127.5, (112, 112), (127.5, 127.5, 127.5))
                net.setInput(blob)
                out.append(net.forward().reshape(-1))
            return np.stack(out)

        return embedder

    def pixel_embedder(crops):
        """Normalized 24x24 downsampled pixels — separates visually
        distinct faces; replace with a recognition model for production."""
        n = crops.shape[0]
        ys = np.linspace(0, crops.shape[1] - 1, 24).astype(int)
        xs = np.linspace(0, crops.shape[2] - 1, 24).astype(int)
        flat = crops[:, ys][:, :, xs].reshape(n, -1).astype(np.float32)
        flat -= flat.mean(axis=1, keepdims=True)
        return flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True),
                                 1e-6)

    return pixel_embedder


def build_asd_scorer(args, wav_1d, fs):
    if args.asd_exp_dir:
        from speaker3d_tpu.diar.video import make_talknet_asd_scorer
        from speaker3d_tpu.utils.checkpoint import Checkpointer

        recovered = Checkpointer(
            os.path.join(args.asd_exp_dir, "models")).recover_if_possible()
        if recovered is None or "asd_state" not in recovered:
            raise FileNotFoundError(
                f"no TalkNet checkpoint under {args.asd_exp_dir}/models")
        st = recovered["asd_state"]
        variables = {"params": st["params"],
                     "batch_stats": st["batch_stats"]}
        return make_talknet_asd_scorer(variables)

    hop = int(0.01 * fs)

    def energy_scorer(audio_mfcc, face_crops):
        """Heuristic: active when the synchronized audio has energy.
        (stands in for asd.onnx; every visible face in a single-face scene
        gets speech credit — JointClustering's overlap voting still works)"""
        n = face_crops.shape[0]
        scores = np.zeros(n, np.float32)
        if audio_mfcc.size:
            e = np.square(audio_mfcc).mean(axis=-1)
            e = e.reshape(n, -1).mean(axis=1) if e.size >= n else np.resize(e, n)
            thr = np.percentile(e, 20)
            scores = (e > thr).astype(np.float32)
        return scores

    return energy_scorer


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    args = get_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    from speaker3d_tpu.diar.cluster import CommonClustering, JointClustering
    from speaker3d_tpu.diar.pipeline import DiarizationPipeline, compressed_seg
    from speaker3d_tpu.diar.video import (
        build_face_tracks,
        embed_tracks,
        score_tracks_asd,
        tracks_to_vision_inputs,
    )
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.ops.mfcc import mfcc
    from speaker3d_tpu.utils.fileio import load_audio

    fs = 16000
    tmp_wav = None
    if not args.wav:
        tmp_wav = extract_audio(args.video, fs)
    wav_path = args.wav or tmp_wav
    try:
        wav_1d = np.asarray(load_audio(wav_path, obj_fs=fs))[0]
    finally:
        if tmp_wav:
            os.unlink(tmp_wav)

    # vision chain — streamed: the three tee'd iterators advance in
    # lockstep (frame, time pulled by the tracking zip; source index pulled
    # by the detector), so memory stays bounded by live face crops.
    import itertools

    stream = read_frames(args.video, args.fps)
    if args.face_boxes_json:  # detector consumes indices in lockstep
        s_frames, s_times, s_idx = itertools.tee(stream, 3)
        src_idx_iter = (i for i, _, _ in s_idx)
    else:  # a lagging tee branch would buffer every frame
        s_frames, s_times = itertools.tee(stream, 2)
        src_idx_iter = None
    frames = (g for _, _, g in s_frames)
    frame_times_it = (t for _, t, _ in s_times)
    spacing = {"first": None, "second": None}

    def times_with_spacing():
        for t in frame_times_it:
            if spacing["first"] is None:
                spacing["first"] = t
            elif spacing["second"] is None:
                spacing["second"] = t
            yield t

    detector = build_face_detector(args, src_idx_iter=src_idx_iter)
    tracks = build_face_tracks(frames, times_with_spacing(), detector,
                               min_quality=args.face_min_quality)
    frame_spacing = ((spacing["second"] - spacing["first"])
                     if spacing["second"] is not None else 1.0 / args.fps)
    actual_fps = 1.0 / max(frame_spacing, 1e-6)
    if tracks:
        audio_mfcc = mfcc(wav_1d, fs)
        score_tracks_asd(tracks, audio_mfcc,
                         build_asd_scorer(args, wav_1d, fs), fps=actual_fps)
        embed_tracks(tracks, build_face_embedder(args))

    # audio chain
    if args.exp_dir:
        from speaker3d_tpu.cli.extract import build_model_from_exp

        model, variables, _ = build_model_from_exp(args.exp_dir)
    else:
        from speaker3d_tpu.cli.registry import load_pretrained

        model, variables = load_pretrained(args.model_id, args.local_model_dir)
    embed_fn = build_embedding_fn(model, variables, precision="high")
    pipe = DiarizationPipeline(embed_fn, vad_threshold=args.vad_threshold,
                               batch_size=args.batch_size,
                               speaker_num=args.speaker_num)
    fields = pipe(wav_1d)

    base = os.path.splitext(os.path.basename(args.video))[0]
    if tracks and fields:
        import types

        visionX, visionT = tracks_to_vision_inputs(tracks)
        joint = JointClustering(
            CommonClustering("AHC", mer_cos=0.3, fix_cos_thr=0.3),
            CommonClustering("AHC", mer_cos=0.3, fix_cos_thr=0.3))
        # JointClustering's vision-segment builder assumes 25 fps detections
        # (reference: process/cluster.py:305 stride_gap = stride*0.04);
        # derive the stride from the MEASURED sampled-frame spacing (the
        # requested --fps is only approximate after integer decimation) so
        # consecutive frames always chain.
        conf = types.SimpleNamespace(face_det_stride=frame_spacing / 0.04)
        labels = joint(pipe.last_embeddings, visionX,
                       [list(c) for c in pipe.last_chunks], visionT,
                       conf=conf)
        fields = compressed_seg(
            [[c[0], c[1], int(l)] for c, l in zip(pipe.last_chunks, labels)])

    out_rttm = os.path.join(args.out_dir, base + ".rttm")
    pipe.save_diar_output(out_rttm, wav_id=base, output_field_labels=fields)
    n_spk = len({f[2] for f in fields})
    print(f"{base}: {len(fields)} segments, {n_spk} speakers, "
          f"{len(tracks)} face tracks -> {out_rttm}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
