"""ASD train-step smoke test on a tiny audio-visual model."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.train.asd_train import (
    ASDTrainConfig,
    init_asd_train_state,
    make_asd_train_step,
)


class TinyAV(nn.Module):
    @nn.compact
    def __call__(self, audio, visual, train=False):
        # audio [B, 4T, F] -> [B, T, 8]
        a = nn.Dense(8)(audio)
        a = a.reshape(a.shape[0], a.shape[1] // 4, 4, 8).mean(axis=2)
        v = nn.Dense(8)(visual.reshape(*visual.shape[:2], -1))
        av = jnp.concatenate([a, v], axis=-1)
        return nn.Dense(2)(av), nn.Dense(2)(a), nn.Dense(2)(v)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_asd_training_learns():
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    cfg = ASDTrainConfig(lr=5e-3, step_per_epoch=10)
    rng = np.random.default_rng(0)
    B, T = 8, 6
    labels = rng.integers(0, 2, (B, T)).astype(np.int32)
    audio = rng.standard_normal((B, 4 * T, 13)).astype(np.float32) * 0.1
    audio += np.repeat(labels, 4, axis=1)[..., None] * 1.5
    visual = rng.standard_normal((B, T, 8, 8)).astype(np.float32) * 0.1
    visual += labels[..., None, None] * 1.5
    batch = {"audio": audio, "visual": visual, "labels": labels}

    model = TinyAV()
    state = init_asd_train_state(jax.random.PRNGKey(0), model, audio[:1],
                                 visual[:1], cfg, mesh)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_asd_train_step(model, cfg, mesh, host)

    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # mAP on the training batch should be near-perfect
    from speaker3d_tpu.utils.metrics import average_precision

    scores = np.asarray(metrics["scores"]).reshape(-1)
    ap = average_precision(labels.reshape(-1), scores)
    assert ap > 0.9, ap


def test_train_asd_cli_e2e(tmp_path):
    """cli.train_asd end-to-end on a tiny synthetic AVA-layout corpus
    (loader CSV + per-entity wavs + face-crop jpgs), incl. --profile_dir."""
    import os

    import cv2

    from speaker3d_tpu.utils.fileio import write_wav

    FS = 16000
    rng = np.random.default_rng(0)
    audio_dir = os.path.join(tmp_path, "clips_audios")
    video_dir = os.path.join(tmp_path, "clips_videos")
    rows = []
    for k in range(3):
        video = f"vid{k:08d}"          # 11-char video id (AVA [:11] slice)
        entity = f"{video}_e0"
        n_frames = 10
        os.makedirs(os.path.join(audio_dir, video), exist_ok=True)
        ent_dir = os.path.join(video_dir, video, entity)
        os.makedirs(ent_dir, exist_ok=True)
        dur = n_frames / 25.0
        wav = (0.2 * rng.standard_normal(int(dur * FS))).astype(np.float32)
        write_wav(os.path.join(audio_dir, video, entity + ".wav"), wav, FS)
        labels = [(i + k) % 2 for i in range(n_frames)]
        for i in range(n_frames):
            img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(ent_dir, f"{i / 25.0:.2f}.jpg"), img)
        rows.append(f"{entity}\t{n_frames}\t25\t"
                    f"[{','.join(str(l) for l in labels)}]\t{sum(labels)}")
    train_csv = os.path.join(tmp_path, "train.csv")
    with open(train_csv, "w") as f:
        f.write("\n".join(rows) + "\n")

    from speaker3d_tpu.cli.train_asd import main as asd_main

    exp_dir = os.path.join(tmp_path, "exp")
    prof = os.path.join(tmp_path, "prof")
    asd_main(["--train_csv", train_csv, "--val_csv", train_csv,
              "--audio_dir", audio_dir, "--video_dir", video_dir,
              "--exp_dir", exp_dir, "--batch_size", "20", "--epochs", "2",
              "--profile_dir", prof, "--profile_steps", "1"])
    assert os.path.isdir(os.path.join(exp_dir, "models", "CKPT-EPOCH-2-00"))
    traces = []
    for dirpath, _, files in os.walk(prof):
        traces += [f for f in files if f.endswith(".xplane.pb")]
    assert traces, "no profiler trace written"
