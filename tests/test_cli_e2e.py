"""End-to-end CLI test: synthetic corpus -> train -> extract -> score.

Covers the full supervised SV workflow (reference: egs/*/run.sh stages 2-6)
at toy scale on the virtual CPU mesh.
"""

import os

import numpy as np
import pytest
import yaml

from speaker3d_tpu.utils.fileio import write_wav

FS = 16000


def _make_corpus(root, n_spk=3, n_utt=6, dur=1.0, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rows = []
    freqs = [200, 800, 2600]
    for s in range(n_spk):
        for u in range(n_utt):
            t = np.arange(int(dur * FS)) / FS
            f = freqs[s] * (1 + 0.02 * rng.standard_normal())
            wav = 0.3 * np.sin(2 * np.pi * f * t) \
                + 0.1 * np.sin(2 * np.pi * 2 * f * t) \
                + 0.01 * rng.standard_normal(len(t))
            path = os.path.join(root, "wav", f"spk{s}_utt{u}.wav")
            write_wav(path, wav.astype(np.float32), FS)
            rows.append((f"spk{s}_utt{u}", path, f"spk{s}"))
    csv_path = os.path.join(root, "train.csv")
    with open(csv_path, "w") as f:
        f.write("ID,wav,spk\n")
        for rid, path, spk in rows:
            f.write(f"{rid},{path},{spk}\n")
    return csv_path, rows


@pytest.mark.skipif(len(__import__("jax").devices()) < 8,
                    reason="needs 8 virtual devices")
def test_train_extract_score_e2e(tmp_path):
    root = str(tmp_path)
    csv_path, rows = _make_corpus(root)

    config = {
        "exp_dir": os.path.join(root, "exp"),
        "data": csv_path,
        "sample_rate": FS,
        "n_mels": 80,
        "wav_len": 0.6,
        "speed_pertub": False,
        "aug_prob": 0.0,
        "batch_size": 8,
        "num_workers": 2,
        "num_epoch": 2,
        "model_parallel": 2,
        "embedding_size": 32,
        "max_lr": 0.05,
        "min_lr": 0.001,
        "warmup_epoch": 1,
        "log_batch_freq": 1,
        "model": {
            "obj": "speaker3d_tpu.models.eres2netv2.ERes2NetV2",
            "args": {"feat_dim": 80, "embedding_size": 32,
                     "m_channels": 8, "num_blocks": [1, 1, 1, 1]},
        },
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from speaker3d_tpu.cli.train import main as train_main

    train_main(["--config", cfg_path])
    exp_dir = config["exp_dir"]
    assert os.path.isfile(os.path.join(exp_dir, "config.yaml"))
    assert os.path.isdir(os.path.join(exp_dir, "models", "CKPT-EPOCH-2-00"))
    assert os.path.isfile(os.path.join(exp_dir, "train_epoch.log"))

    # wav.scp + extraction
    scp = os.path.join(root, "wav.scp")
    with open(scp, "w") as f:
        for rid, path, _ in rows:
            f.write(f"{rid} {path}\n")

    from speaker3d_tpu.cli.extract import main as extract_main

    emb_dir = os.path.join(exp_dir, "embeddings")
    extract_main(["--exp_dir", exp_dir, "--data", scp, "--out_dir", emb_dir,
                  "--mode", "chunked", "--batch_size", "8"])
    from speaker3d_tpu.eval.scoring import load_embeddings

    embs = load_embeddings(emb_dir)
    assert len(embs) == len(rows)

    # trials: same-speaker pairs + cross-speaker pairs
    trials_path = os.path.join(root, "trials.txt")
    with open(trials_path, "w") as f:
        ids = [r[0] for r in rows]
        spks = {r[0]: r[2] for r in rows}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                y = 1 if spks[ids[i]] == spks[ids[j]] else 0
                f.write(f"{ids[i]} {ids[j]} {y}\n")

    from speaker3d_tpu.cli.compute_score_metrics import main as score_main

    scores_dir = os.path.join(exp_dir, "scores")
    score_main(["--enrol_data", emb_dir, "--test_data", emb_dir,
                "--scores_dir", scores_dir, "--trials", trials_path])
    assert os.path.isfile(os.path.join(scores_dir, "result.metrics"))
    assert os.path.isfile(os.path.join(scores_dir, "trials.txt.score"))

    # exact-mode extraction should also work and correlate with chunked
    emb_dir2 = os.path.join(exp_dir, "embeddings_exact")
    extract_main(["--exp_dir", exp_dir, "--data", scp, "--out_dir", emb_dir2,
                  "--mode", "exact"])
    embs2 = load_embeddings(emb_dir2)
    assert len(embs2) == len(rows)
