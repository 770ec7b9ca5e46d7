"""Audio-visual diarization driver e2e: synthetic 2-speaker video where the
speaking face is visible only during its own turns; JointClustering must
recover 2 speakers even when the toy audio embedder merges them.
(reference behavior: run_video.sh + local/cluster_and_postprocess.py:76-101)"""

import json
import os

import numpy as np
import pytest
import yaml

FS = 16000


def _tone(freq, dur, seed):
    t = np.arange(int(dur * FS)) / FS
    sig = np.sin(2 * np.pi * freq * t) + 0.3 * np.sin(2 * np.pi * 2 * freq * t)
    return (0.3 * sig + 0.01 * np.random.default_rng(seed)
            .standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def video_setup(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = str(tmp_path_factory.mktemp("video"))
    from speaker3d_tpu.utils.fileio import write_wav

    # ---- audio: sil A(4s) sil B(4s) sil A(3s) sil ----
    sil = np.zeros(int(0.8 * FS), np.float32)
    wav = np.concatenate([sil, _tone(220, 4, 1), sil, _tone(2000, 4, 2),
                          sil, _tone(220, 3, 3), sil])
    wav_path = os.path.join(root, "conv.wav")
    write_wav(wav_path, wav, FS)
    dur = len(wav) / FS

    # ---- video: 10 fps, face A = checkerboard, face B = gradient ----
    fps, W, H = 10, 160, 120
    n_frames = int(dur * fps)
    vid_path = os.path.join(root, "conv.avi")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                         (W, H))
    if not vw.isOpened():
        pytest.skip("cv2 has no MJPG encoder in this build")
    turns = [(0.8, 4.8, "A"), (5.6, 9.6, "B"), (10.4, 13.4, "A")]
    faceA = ((np.indices((48, 48)).sum(axis=0) % 8 < 4) * 255).astype(np.uint8)
    faceB = np.tile(np.linspace(30, 220, 48).astype(np.uint8), (48, 1))
    boxes = {}
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        t = i / fps
        frame = rng.integers(0, 30, (H, W), np.uint8)
        cur = [s for st, ed, s in turns if st <= t < ed]
        bl = []
        if "A" in cur:
            frame[20:68, 10:58] = faceA
            bl.append([10, 20, 48, 48])
        if "B" in cur:
            frame[20:68, 100:148] = faceB
            bl.append([100, 20, 48, 48])
        boxes[i] = bl
        vw.write(cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR))
    vw.release()
    cap = cv2.VideoCapture(vid_path)
    ok, _ = cap.read()
    cap.release()
    if not ok:
        pytest.skip("cv2 cannot read back MJPG avi in this build")
    boxes_path = os.path.join(root, "boxes.json")
    with open(boxes_path, "w") as f:
        json.dump(boxes, f)

    # ---- tiny audio exp (same recipe as test_cli_extra) ----
    from speaker3d_tpu.utils.fileio import write_wav as _ww

    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rows = []
    rng2 = np.random.default_rng(1)
    for s in range(2):
        for u in range(4):
            w = (0.3 * np.sin(2 * np.pi * (250 + 900 * s)
                              * np.arange(FS) / FS)
                 + 0.01 * rng2.standard_normal(FS)).astype(np.float32)
            p = os.path.join(root, "wav", f"s{s}u{u}.wav")
            _ww(p, w, FS)
            rows.append((f"s{s}u{u}", p, f"spk{s}"))
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("ID,wav,spk\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    config = {
        "exp_dir": os.path.join(root, "exp"),
        "data": os.path.join(root, "train.csv"),
        "wav_len": 0.5, "speed_pertub": False, "aug_prob": 0.0,
        "batch_size": 8, "num_workers": 2, "num_epoch": 3,
        "embedding_size": 16, "max_lr": 0.1, "min_lr": 0.01,
        "warmup_epoch": 1, "log_batch_freq": 1,
        "model": {"obj": "speaker3d_tpu.models.xvector.Xvector",
                  "args": {"feat_dim": 80, "hid_dim": 16, "stats_dim": 32,
                           "embed_dim": 16}},
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    from speaker3d_tpu.cli.train import main as train_main

    train_main(["--config", cfg_path])
    return root, wav_path, vid_path, boxes_path, config["exp_dir"]


def test_video_driver_e2e(video_setup, tmp_path):
    root, wav_path, vid_path, boxes_path, exp_dir = video_setup
    from speaker3d_tpu.cli.infer_diarization_video import main

    out_dir = str(tmp_path)
    rc = main(["--video", vid_path, "--wav", wav_path,
               "--out_dir", out_dir, "--exp_dir", exp_dir,
               "--face_boxes_json", boxes_path, "--fps", "10"])
    assert rc == 0
    rttm = os.path.join(out_dir, "conv.rttm")
    lines = open(rttm).read().strip().splitlines()
    assert lines, "empty rttm"
    spks = {ln.split()[7] for ln in lines}
    # vision reconciliation must separate the two speakers even though the
    # 3-epoch toy audio embedder alone tends to merge them
    assert len(spks) == 2, lines
    # turn boundaries ~ VAD boundaries
    starts = sorted(float(ln.split()[3]) for ln in lines)
    assert abs(starts[0] - 0.8) < 0.2, lines


def test_video_driver_errors(video_setup, tmp_path):
    root, wav_path, vid_path, boxes_path, exp_dir = video_setup
    from speaker3d_tpu.cli.infer_diarization_video import main

    with pytest.raises(RuntimeError, match="face detector"):
        main(["--video", vid_path, "--wav", wav_path,
              "--out_dir", str(tmp_path), "--exp_dir", exp_dir])


def test_video_driver_decimated_fps(video_setup, tmp_path):
    """--fps below the source rate: boxes are keyed by SOURCE frame index,
    and the vision-segment stride derives from the measured spacing, so the
    joint step must still separate the speakers (regression: sampled-order
    keying + hardcoded 25fps stride silently degraded to audio-only)."""
    root, wav_path, vid_path, boxes_path, exp_dir = video_setup
    from speaker3d_tpu.cli.infer_diarization_video import main

    out_dir = str(tmp_path)
    rc = main(["--video", vid_path, "--wav", wav_path,
               "--out_dir", out_dir, "--exp_dir", exp_dir,
               "--face_boxes_json", boxes_path, "--fps", "5"])
    assert rc == 0
    lines = open(os.path.join(out_dir, "conv.rttm")).read().splitlines()
    spks = {ln.split()[7] for ln in lines}
    assert len(spks) == 2, lines
