"""ASD dataset + MFCC tests (synthetic AVA-style layout)."""

import os

import numpy as np

from speaker3d_tpu.ops.mfcc import mfcc


def test_mfcc_shapes_and_energy():
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(16000) * 3000).astype(np.int16)
    out = mfcc(sig, 16000)
    # psf frame count: 1 + ceil((16000-400)/160) = 99 frames
    assert out.shape == (99, 13)
    # c0 is log energy: louder signal -> larger c0
    out_loud = mfcc((sig.astype(np.int32) * 8).astype(np.int16), 16000)
    assert out_loud[:, 0].mean() > out[:, 0].mean()
    # fps-scaled window (reference: dataset_asd.py:42)
    out30 = mfcc(sig, 16000, winlen=0.025 * 25 / 30.0, winstep=0.010 * 25 / 30.0)
    assert out30.shape[0] > out.shape[0]


def test_asd_dataset(tmp_path):
    import cv2

    from speaker3d_tpu.data.dataset_asd import TrainData, ValData
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(0)
    audio_dir = os.path.join(tmp_path, "audio")
    video_dir = os.path.join(tmp_path, "video")
    lines = []
    fs = 16000
    for ci in range(3):
        video = f"vid{ci:08d}"  # 11 chars (AVA video-id length)
        clip = f"{video}_c{ci}"
        n_frames = 10 + 5 * ci
        os.makedirs(os.path.join(audio_dir, video), exist_ok=True)
        os.makedirs(os.path.join(video_dir, video, clip), exist_ok=True)
        dur = n_frames / 25.0
        write_wav(os.path.join(audio_dir, video, clip + ".wav"),
                  (rng.standard_normal(int(dur * fs)) * 0.1).astype(np.float32),
                  fs)
        for f in range(n_frames):
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(video_dir, video, clip,
                                     f"{f * 0.04:.2f}.jpg"), img)
        labels = "[" + ",".join(str(int(x)) for x in
                                rng.integers(0, 2, n_frames)) + "]"
        lines.append(f"{clip}\t{n_frames}\t25\t{labels}\t{ci}")

    csv = os.path.join(tmp_path, "train.csv")
    with open(csv, "w") as f:
        f.write("\n".join(lines))

    td = TrainData(csv, audio_dir, video_dir, batch_size=30)
    assert len(td) >= 1
    audio, visual, labels = td[0]
    b, t4, d = audio.shape
    assert d == 13 and t4 == visual.shape[1] * 4
    assert visual.shape[2:] == (112, 112)
    assert labels.shape == (b, visual.shape[1])

    vd = ValData(csv, audio_dir, video_dir)
    a2, v2, l2 = vd[0]
    assert a2.shape[0] == 1 and a2.shape[2] == 13
