"""SSL trainer CLI end-to-end at toy scale: train_ssl -> extract_ssl ->
infer_sv_ssl."""

import os

import jax
import numpy as np
import pytest
import yaml

FS = 16000


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_train_ssl_rdino_e2e(tmp_path):
    from speaker3d_tpu.utils.fileio import write_wav

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    scp = os.path.join(root, "wav.scp")
    with open(scp, "w") as f:
        for i in range(8):
            p = os.path.join(root, f"u{i}.wav")
            write_wav(p, (rng.standard_normal(3 * FS) * 0.1).astype(np.float32),
                      FS)
            f.write(f"u{i} {p}\n")

    exp_dir = os.path.join(root, "exp")
    config = {
        "exp_dir": exp_dir, "data": scp,
        "max_frames": 100,          # 1s globals, 0.5s locals
        "glb_num": 2, "local_num": 4,
        "batch_size": 4, "num_workers": 2,
        "epochs": 1, "warmup_epochs": 1,
        "lr": 0.01, "n_mels": 80,
        "embedding_dim": 32, "out_dim": 64, "add_dim": 48,
        "bottleneck_dim": 16,
        "channels": [32, 32, 32, 32, 96],
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from speaker3d_tpu.cli.train_ssl import main as ssl_main

    ssl_main(["--config", cfg_path, "--variant", "rdino"])
    assert os.path.isfile(os.path.join(exp_dir, "log.txt"))
    assert os.path.isdir(os.path.join(exp_dir, "models", "CKPT-EPOCH-1-00"))

    from speaker3d_tpu.cli.extract_ssl import main as ex_main

    emb_dir = os.path.join(exp_dir, "embs")
    ex_main(["--exp_dir", exp_dir, "--data", scp, "--out_dir", emb_dir,
             "--variant", "rdino"])
    from speaker3d_tpu.eval.scoring import load_embeddings

    embs = load_embeddings(emb_dir)
    assert len(embs) == 8
    assert next(iter(embs.values())).shape == (32,)

    from speaker3d_tpu.cli.infer_sv_ssl import main as sv_main

    sv_main(["--exp_dir", exp_dir, "--variant", "rdino",
             "--wavs", os.path.join(root, "u0.wav"),
             os.path.join(root, "u1.wav")])
