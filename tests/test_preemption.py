"""Preemption-safe training: SIGTERM -> mid-run checkpoint -> clean exit ->
resume (new capability — the reference has no failure handling beyond
torchrun restart)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import yaml

FS = 16000


def _make_corpus(root):
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("ID,wav,spk\n")
        for s in range(2):
            for u in range(4):
                wav = (0.3 * np.sin(2 * np.pi * (250 + 900 * s)
                                    * np.arange(FS) / FS)
                       + 0.01 * rng.standard_normal(FS)).astype(np.float32)
                p = os.path.join(root, "wav", f"s{s}u{u}.wav")
                write_wav(p, wav, FS)
                f.write(f"s{s}u{u},{p},spk{s}\n")
    config = {
        "exp_dir": os.path.join(root, "exp"),
        "data": os.path.join(root, "train.csv"),
        "wav_len": 0.5, "speed_pertub": False, "aug_prob": 0.0,
        "batch_size": 8, "num_workers": 2, "num_epoch": 500,
        "embedding_size": 16, "max_lr": 0.05, "min_lr": 0.005,
        "warmup_epoch": 1, "log_batch_freq": 1000,
        "model": {"obj": "speaker3d_tpu.models.xvector.Xvector",
                  "args": {"feat_dim": 80, "hid_dim": 16, "stats_dim": 32,
                           "embed_dim": 16}},
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return cfg_path, config


def test_sigterm_checkpoints_and_resumes(tmp_path):
    cfg_path, config = _make_corpus(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-m", "speaker3d_tpu.cli.train",
         "--config", cfg_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait until at least one epoch checkpoint exists (training is running)
    models_dir = os.path.join(config["exp_dir"], "models")
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.isdir(models_dir) and any(
                d.startswith("CKPT-EPOCH-2") for d in os.listdir(models_dir)):
            break
        if proc.poll() is not None:
            raise AssertionError(proc.stdout.read()[-3000:])
        time.sleep(0.5)
    else:
        proc.kill()
        raise AssertionError("training never reached epoch 2")

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, out[-3000:]
    assert "[preemption] checkpoint saved" in out, out[-3000:]

    # resume: must recover and continue from the interrupted epoch
    run2 = subprocess.run(
        [sys.executable, "-m", "speaker3d_tpu.cli.train",
         "--config", cfg_path, "--num_epoch=5"],
        env=env, capture_output=True, text=True, timeout=600)
    assert run2.returncode == 0, run2.stdout[-2000:] + run2.stderr[-2000:]
    assert "recovered from epoch" in run2.stdout, run2.stdout[-2000:]
    # finished the 5-epoch schedule after resume
    assert os.path.isdir(os.path.join(models_dir, "CKPT-EPOCH-5-00")), \
        sorted(os.listdir(models_dir))
