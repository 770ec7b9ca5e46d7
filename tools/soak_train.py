"""On-device training soak with kill+resume (VERDICT r3 item 3).

Runs the REAL `cli/train` for O(1k) steps on the TPU (flagship ERes2NetV2,
bf16, B=128, 3 s crops, synthetic 64-speaker corpus), SIGTERMs it
mid-epoch (GracefulShutdown -> preemption checkpoint), restarts the same
command, and verifies:
  - the loss trajectory CONTINUES across the kill (no re-init),
  - checkpoints load and the interrupted epoch is redone,
  - post-run `cli/extract` embeds with the trained weights,
  - sustained warm throughput + the host/device breakdown (per-epoch
    data_wait_s from cli/train's prefetch meter).

Reference semantics being exercised: torchrun restart + recover-latest
(reference: speakerlab/bin/train.py:82-116).

TPU etiquette (CLAUDE.md): the child processes are launched WITHOUT
PYTHONPATH (axon registration) and never overlap; SIGTERM is only sent
after the first epoch completes (never mid-compile).

Usage (from /root/repo, on the TPU):
    python -c "exec(open('tools/soak_train.py').read())" [workdir]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = "/root/repo"
sys.path.insert(0, REPO)

FS = 16000
N_SPK = 64
UTT_PER_SPK = 4
ROWS = 12800          # 100 steps/epoch at B=128
# Env overrides for short throughput-only reruns (defaults = the full
# 1,000-step kill+resume soak):
#   S3D_SOAK_EPOCHS=3 S3D_SOAK_KILL=0   -> 300 steps, no preemption leg
#   S3D_SOAK_SPEED=1                    -> speed_pertub: true (exercises
#                                          the native host resampler)
EPOCHS = int(os.environ.get("S3D_SOAK_EPOCHS", "10"))
KILL_AFTER_EPOCHS = int(os.environ.get("S3D_SOAK_KILL", "2"))
SPEED_PERTUB = os.environ.get("S3D_SOAK_SPEED", "0") == "1"


def build_corpus(root):
    from speaker3d_tpu.utils.fileio import write_wav

    wav_dir = os.path.join(root, "corpus")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = {}
    for s in range(N_SPK):
        f0 = 90.0 * (1.22 ** (s % 16)) * (1 + 0.01 * (s // 16))
        for u in range(UTT_PER_SPK):
            p = os.path.join(wav_dir, f"s{s}_u{u}.wav")
            if not os.path.exists(p):
                n = 4 * FS
                t = np.arange(n) / FS
                sig = (np.sin(2 * np.pi * f0 * t)
                       + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
                       + 0.25 * np.sin(2 * np.pi * 3 * f0 * t))
                am = 0.6 + 0.4 * np.sin(
                    2 * np.pi * 3.0 * t + rng.uniform(0, 6.28))
                write_wav(p, (0.3 * am * sig + 0.004
                              * rng.standard_normal(n)).astype(np.float32),
                          FS)
            paths.setdefault(s, []).append(p)
    csv = os.path.join(root, "train.csv")
    with open(csv, "w") as f:
        f.write("ID,wav,spk\n")
        i = 0
        while i < ROWS:
            s = i % N_SPK
            u = (i // N_SPK) % UTT_PER_SPK
            f.write(f"row{i},{paths[s][u]},spk{s}\n")
            i += 1
    return csv


def write_config(root, csv):
    import yaml

    cfg = {"exp_dir": os.path.join(root, "exp"), "data": csv,
           "wav_len": 3.0, "speed_pertub": SPEED_PERTUB, "aug_prob": 0.0,
           "batch_size": 128, "num_workers": 2, "num_epoch": EPOCHS,
           "embedding_size": 192, "compute_dtype": "bfloat16",
           "max_lr": 0.1, "min_lr": 0.01, "warmup_epoch": 2,
           "log_batch_freq": 20, "increase_start_epoch": 2,
           "margin_fix_epoch": 8,
           "model": {"obj": "speaker3d_tpu.models.eres2netv2.ERes2NetV2",
                     "args": {"feat_dim": 80, "embedding_size": 192}}}
    p = os.path.join(root, "soak.yaml")
    yaml.safe_dump(cfg, open(p, "w"))
    return p, cfg["exp_dir"]


def child_env():
    # Inherit the environment UNCHANGED: PYTHONPATH here is how the axon
    # sitecustomize (/root/.axon_site) loads — replacing or dropping it is
    # what breaks the plugin registration (CLAUDE.md). /root/repo is added
    # inside the child via sys.path.insert instead.
    return dict(os.environ)


def launch(cfg_path, log_path):
    code = ("import sys; sys.path.insert(0, '/root/repo'); "
            "from speaker3d_tpu.cli.train import main; "
            f"main(['--config', {cfg_path!r}])")
    logf = open(log_path, "a")
    return subprocess.Popen([sys.executable, "-c", code], cwd=REPO,
                            env=child_env(), stdout=logf,
                            stderr=subprocess.STDOUT), logf


def epochs_logged(exp_dir):
    log = os.path.join(exp_dir, "train_epoch.log")
    if not os.path.exists(log):
        return []
    out = []
    for line in open(log):
        if "avg_loss" in line:
            out.append(line.strip())
    return out


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_train"
    os.makedirs(root, exist_ok=True)
    csv = build_corpus(root)
    cfg_path, exp_dir = write_config(root, csv)
    log_path = os.path.join(root, "train_stdout.log")

    # ---- phase 1: run, then SIGTERM after KILL_AFTER_EPOCHS epochs ------
    # (KILL_AFTER_EPOCHS == 0 skips the preemption leg: single run to
    # completion, for short throughput-only reruns)
    t_start = time.time()
    proc, logf = launch(cfg_path, log_path)
    print(f"[soak] phase-1 pid {proc.pid}", flush=True)
    killed_at = None
    while proc.poll() is None:
        time.sleep(10)
        done = len(epochs_logged(exp_dir))
        if KILL_AFTER_EPOCHS and done >= KILL_AFTER_EPOCHS \
                and killed_at is None:
            # mid-epoch by construction: the next epoch started right
            # after the log line was written
            time.sleep(15)  # let epoch KILL_AFTER_EPOCHS+1 get underway
            print(f"[soak] SIGTERM after {done} epochs "
                  f"({time.time()-t_start:.0f}s in)", flush=True)
            proc.send_signal(signal.SIGTERM)
            killed_at = time.time()
        if killed_at and time.time() - killed_at > 600:
            print("[soak] child ignored SIGTERM for 600s", flush=True)
            proc.kill()
            return 1
    logf.close()
    rc1 = proc.returncode
    if KILL_AFTER_EPOCHS:
        txt = open(log_path).read()
        assert "[preemption]" in txt, "no preemption checkpoint recorded"
    e1 = epochs_logged(exp_dir)
    print(f"[soak] phase-1 exit rc={rc1}, epochs logged: {len(e1)}",
          flush=True)

    if KILL_AFTER_EPOCHS:
        # ---- phase 2: resume to completion ------------------------------
        proc, logf = launch(cfg_path, log_path)
        print(f"[soak] phase-2 (resume) pid {proc.pid}", flush=True)
        while proc.poll() is None:
            time.sleep(15)
        logf.close()
        rc2 = proc.returncode
    else:
        rc2 = rc1
    e2 = epochs_logged(exp_dir)
    print(f"[soak] phase-2 exit rc={rc2}, epochs logged: {len(e2)}",
          flush=True)
    assert rc2 == 0, f"resume run failed rc={rc2}"
    assert len(e2) == EPOCHS, (len(e2), EPOCHS)

    # loss trajectory continues: epoch avg_loss must keep decreasing
    # across the kill boundary (a re-init would jump back near the cold
    # start's first-epoch loss)
    import re

    losses, walls, waits = [], [], []
    for line in e2:
        losses.append(float(re.search(r"avg_loss: ([\d.]+)", line).group(1)))
        walls.append(float(re.search(r"time_s: ([\d.]+)", line).group(1)))
        m = re.search(r"data_wait_s: ([\d.]+)", line)
        waits.append(float(m.group(1)) if m else float("nan"))
    if KILL_AFTER_EPOCHS:
        first, mid, last = losses[0], losses[KILL_AFTER_EPOCHS], losses[-1]
        assert last < mid < first, f"loss not decreasing: {losses}"
        assert mid < 0.7 * first, (
            f"post-resume epoch loss {mid} looks re-initialized vs {first}")

    # ---- throughput (warm epochs only: skip the compile epochs) ---------
    steps_per_epoch = ROWS // 128
    audio_s_epoch = steps_per_epoch * 128 * 3.0
    if KILL_AFTER_EPOCHS:
        warm_walls = walls[1:KILL_AFTER_EPOCHS] \
            + walls[KILL_AFTER_EPOCHS + 1:]
        warm_waits = waits[1:KILL_AFTER_EPOCHS] \
            + waits[KILL_AFTER_EPOCHS + 1:]
    else:
        assert EPOCHS >= 2, (
            "S3D_SOAK_KILL=0 needs S3D_SOAK_EPOCHS >= 2: epoch 0 is the "
            "compile epoch and is excluded from the throughput median")
        warm_walls, warm_waits = walls[1:], waits[1:]
    tp = [audio_s_epoch / w for w in warm_walls]
    print(json.dumps({
        "metric": "soak_train_throughput", "unit": "audio-seconds/s/chip",
        "steps_total": EPOCHS * steps_per_epoch,
        "warm_epochs": len(warm_walls),
        "throughput_per_epoch": [round(x, 1) for x in tp],
        "sustained": round(float(np.median(tp)), 1),
        "data_wait_share": [round(wt / w, 3) for wt, w in
                            zip(warm_waits, warm_walls)],
        "epoch_losses": [round(x, 4) for x in losses],
    }), flush=True)

    # ---- post-run extraction with the trained checkpoint ----------------
    from speaker3d_tpu.cli.extract import main as extract_main

    scp = os.path.join(root, "eval.scp")
    with open(scp, "w") as f:
        for s in range(4):
            f.write(f"s{s} {root}/corpus/s{s}_u0.wav\n")
    out = os.path.join(root, "emb")
    extract_main(["--exp_dir", exp_dir, "--data", scp, "--out_dir", out])
    embs = np.load(os.path.join(out, "embeddings_0.npz"))
    assert len(embs.files) == 4
    v = np.stack([embs[k] for k in embs.files])
    assert v.shape == (4, 192) and np.all(np.isfinite(v))
    print("[soak] post-run extract ok:", v.shape, flush=True)
    print("[soak] PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
