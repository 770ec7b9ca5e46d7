"""Tests for the remaining CLI surface: export, check_single_speaker,
infer_sv_batch, predict_label — on a shared tiny trained experiment."""

import json
import os
import subprocess

import numpy as np
import pytest
import yaml

FS = 16000


@pytest.fixture(scope="module")
def tiny_exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exp_extra"))
    rng = np.random.default_rng(0)
    from speaker3d_tpu.utils.fileio import write_wav

    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rows = []
    for s in range(2):
        for u in range(4):
            wav = (0.3 * np.sin(2 * np.pi * (250 + 900 * s)
                                * np.arange(FS) / FS)
                   + 0.01 * rng.standard_normal(FS)).astype(np.float32)
            p = os.path.join(root, "wav", f"s{s}u{u}.wav")
            write_wav(p, wav, FS)
            rows.append((f"s{s}u{u}", p, f"lang{s}"))
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("ID,wav,spk\n")
        for rid, p, spk in rows:
            f.write(f"{rid},{p},{spk}\n")
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
    return root, config, rows


def test_export_and_reload(tiny_exp, tmp_path):
    root, config, rows = tiny_exp
    out = os.path.join(tmp_path, "model.stablehlo")
    from speaker3d_tpu.cli.export_speaker_embedding import (
        load_exported,
        main as export_main,
    )

    aot_dir = os.path.join(tmp_path, "aot")
    export_main(["--exp_dir", config["exp_dir"], "--out", out,
                 "--frames", "60", "--aot_dir", aot_dir])
    assert os.path.isfile(out)
    meta = json.load(open(out + ".json"))
    fn = load_exported(out)
    feats = np.random.default_rng(1).standard_normal(
        (1, 60, 80)).astype(np.float32)
    emb = np.asarray(fn(feats))
    assert emb.shape == (1, 16)
    # AOT artifact for the standalone C++ PJRT engine
    assert os.path.isfile(os.path.join(aot_dir, "model.mlir.bc"))
    assert os.path.isfile(os.path.join(aot_dir, "model.mlir"))
    aot_meta = json.load(open(os.path.join(aot_dir, "aot.json")))
    assert aot_meta["embedding_dim"] == 16 and aot_meta["frames"] == 60


def test_check_single_speaker(tiny_exp, tmp_path):
    root, config, rows = tiny_exp
    out = os.path.join(tmp_path, "verdict.json")
    from speaker3d_tpu.cli.check_single_speaker import main as css_main

    css_main(["--wav", rows[0][1], "--exp_dir", config["exp_dir"],
              "--out", out, "--threshold", "0.5"])
    data = json.load(open(out))
    assert "is_single_speaker" in data
    assert data["num_segments"] >= 1


def test_infer_sv_batch(tiny_exp, tmp_path):
    root, config, rows = tiny_exp
    lst = os.path.join(tmp_path, "wavs.list")
    with open(lst, "w") as f:
        for _, p, _ in rows[:3]:
            f.write(p + "\n")
    out_dir = os.path.join(tmp_path, "embs")
    from speaker3d_tpu.cli.infer_sv_batch import main as batch_main

    batch_main(["--exp_dir", config["exp_dir"], "--wavs", lst,
                "--out_dir", out_dir, "--out_type", "npy",
                "--batch_size", "4"])
    npys = [f for f in os.listdir(out_dir) if f.endswith(".npy")]
    assert len(npys) == 3
    emb = np.load(os.path.join(out_dir, npys[0]))
    assert emb.shape == (16,)


def test_predict_label_accuracy(tiny_exp, tmp_path):
    root, config, rows = tiny_exp
    scp = os.path.join(tmp_path, "wav.scp")
    u2l = os.path.join(tmp_path, "utt2lang")
    with open(scp, "w") as f, open(u2l, "w") as g:
        for rid, p, lang in rows:
            f.write(f"{rid} {p}\n")
            g.write(f"{rid} {lang}\n")
    out = os.path.join(tmp_path, "preds.txt")
    from speaker3d_tpu.cli.predict_label import main as pl_main

    pl_main(["--exp_dir", config["exp_dir"], "--data", scp,
             "--utt2label", u2l, "--out", out])
    preds = dict(l.split() for l in open(out))
    assert len(preds) == len(rows)
    # two tonal classes trained for 3 epochs should be mostly separable
    correct = sum(preds[rid] == lang for rid, _, lang in rows)
    assert correct >= len(rows) // 2


def test_run_diarization_on_dir_driver(tiny_exp, tmp_path):
    """Top-level driver: pattern scan -> per-file JSON + aggregated summary."""
    import sys

    root, config, rows = tiny_exp
    out_dir = os.path.join(tmp_path, "diar_out")
    summary = os.path.join(tmp_path, "summary.json")
    sys.path.insert(0, "/root/repo")
    import run_diarization_on_dir as driver

    argv_backup = sys.argv
    sys.argv = ["run_diarization_on_dir.py",
                "--src_dir", os.path.join(root, "wav"),
                "--pattern", "*.wav",
                "--out_dir", out_dir,
                "--summary_out", summary,
                "--exp_dir", config["exp_dir"],
                "--per_sentence_reindex"]
    try:
        rc = driver.main()
    finally:
        sys.argv = argv_backup
    assert rc == 0
    data = json.load(open(summary))
    assert len(data) == len(rows)
    first = next(iter(data.values()))
    assert "num_speakers" in first and first["segments"]


def test_run_diarization_speech_estimate_driver(tiny_exp, tmp_path):
    """Top-level driver: pattern scan, knob forwarding, default out_dir
    naming (<src>_3dspeaker_diarization), JSON + sidecar outputs."""
    import shutil
    import sys

    root, config, rows = tiny_exp
    src_dir = os.path.join(tmp_path, "estimates")
    os.makedirs(src_dir)
    for rid, p, _ in rows[:2]:
        shutil.copy(p, os.path.join(src_dir, f"{rid}_speech_estimate.wav"))
    sys.path.insert(0, "/root/repo")
    import run_diarization_speech_estimate as driver

    argv_backup = sys.argv
    sys.argv = ["run_diarization_speech_estimate.py",
                "--src_dir", src_dir,
                "--exp_dir", config["exp_dir"],
                "--speaker_num", "1",
                "--vad_min_speech_ms", "150",
                "--vad_max_silence_ms", "250",
                "--cluster_mer_cos", "0.3",
                "--batch_size", "8"]
    try:
        rc = driver.main()
    finally:
        sys.argv = argv_backup
    assert rc == 0
    out_dir = os.path.join(tmp_path, "estimates_3dspeaker_diarization")
    assert os.path.isdir(out_dir)
    jsons = [f for f in os.listdir(out_dir)
             if f.endswith(".json") and "." not in f[:-5]]
    assert len(jsons) == 2
    segs = json.load(open(os.path.join(out_dir, jsons[0])))
    assert segs and all("speaker" in v for v in segs.values())
    metas = [f for f in os.listdir(out_dir) if f.endswith(".meta.json")]
    assert len(metas) == 2


def test_infer_diarization_nprocs_fanout(tiny_exp, tmp_path):
    """--nprocs spawns rank::nprocs subprocess shards that jointly cover
    every input file (reference: mp.spawn per GPU)."""
    root, config, rows = tiny_exp
    out_dir = os.path.join(tmp_path, "fan_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    wavs = [p for _, p, _ in rows[:3]]
    res = subprocess.run(
        [os.sys.executable, "-m", "speaker3d_tpu.cli.infer_diarization",
         "--wav", *wavs, "--out_dir", out_dir,
         "--exp_dir", config["exp_dir"], "--nprocs", "2",
         "--out_type", "json"],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    produced = sorted(f for f in os.listdir(out_dir) if f.endswith(".json"))
    assert produced == sorted(
        os.path.splitext(os.path.basename(p))[0] + ".json" for p in wavs)


def test_train_warm_start_init_exp_dir(tiny_exp, tmp_path):
    """--init_exp_dir warm-starts model+classifier weights with a fresh
    optimizer (reference LM-finetune semantics: copy ckpt, reset epoch).
    With lr=0 the finetuned checkpoint's weights must equal the source's."""
    root, config, rows = tiny_exp
    from speaker3d_tpu.cli.train import main as train_main
    from speaker3d_tpu.utils.checkpoint import Checkpointer

    lm_exp = os.path.join(tmp_path, "exp_lm")
    train_main(["--config", os.path.join(root, "cfg.yaml"),
                f"--exp_dir={lm_exp}",
                f"--init_exp_dir={config['exp_dir']}",
                "--num_epoch=1", "--max_lr=0.0", "--min_lr=0.0",
                "--warmup_epoch=1"])

    src = Checkpointer(os.path.join(config["exp_dir"], "models")) \
        .recover_if_possible()["train_state"]
    dst = Checkpointer(os.path.join(lm_exp, "models")) \
        .recover_if_possible()["train_state"]
    import jax

    for key in ("params", "cls_w"):
        for a, b in zip(jax.tree_util.tree_leaves(src[key]),
                        jax.tree_util.tree_leaves(dst[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(dst["step"]) == 1  # fresh counter, one lr=0 epoch of 1 step


def test_train_warm_start_shape_mismatch(tiny_exp, tmp_path):
    root, config, rows = tiny_exp
    from speaker3d_tpu.cli.train import main as train_main

    with pytest.raises(ValueError, match="shapes differ"):
        train_main(["--config", os.path.join(root, "cfg.yaml"),
                    f"--exp_dir={os.path.join(tmp_path, 'bad')}",
                    f"--init_exp_dir={config['exp_dir']}",
                    "--embedding_size=8", "--num_epoch=1"])


def test_process_shard_env_override(monkeypatch):
    from speaker3d_tpu.parallel.mesh import process_shard

    items = list(range(7))
    monkeypatch.setenv("SPEAKER3D_PROC_INDEX", "1")
    monkeypatch.setenv("SPEAKER3D_PROC_COUNT", "3")
    assert process_shard(items) == [1, 4]
    # explicit args win over the environment
    assert process_shard(items, 0, 2) == [0, 2, 4, 6]
    # shards partition the list
    monkeypatch.delenv("SPEAKER3D_PROC_INDEX")
    monkeypatch.delenv("SPEAKER3D_PROC_COUNT")
    shards = [process_shard(items, r, 3) for r in range(3)]
    assert sorted(x for s in shards for x in s) == items


def test_analyze_similarity(tmp_path):
    """Similarity analysis CLI (reference fork: egs/mix_adult_kid
    compute_utterance_similarities_analysis.py semantics)."""
    import numpy as np

    rng = np.random.default_rng(0)
    emb_dir = os.path.join(tmp_path, "emb")
    os.makedirs(emb_dir)
    # two datasets x two speakers; spk a_1 and b_1 share a direction
    base = rng.standard_normal((3, 32)).astype(np.float32)
    spk_vec = {"a_1": base[0], "a_2": base[1],
               "b_1": base[0] + 0.1 * base[2], "b_2": -base[1]}
    utt2spk_lines = []
    for spk, v in spk_vec.items():
        for u in range(3):
            utt = f"{spk}_utt{u}"
            e = v + 0.05 * rng.standard_normal(32)
            np.save(os.path.join(emb_dir, utt + ".npy"), e.astype(np.float32))
            utt2spk_lines.append(f"{utt} {spk}")
    u2s = os.path.join(tmp_path, "utt2spk")
    open(u2s, "w").write("\n".join(utt2spk_lines) + "\n")

    from speaker3d_tpu.cli.analyze_similarity import main

    out = os.path.join(tmp_path, "sim")
    rc = main(["--emb", emb_dir, "--out_dir", out, "--utt2spk", u2s,
               "--prefix_as", "1", "--min_similarity", "0.5"])
    assert rc == 0
    rep = json.load(open(os.path.join(out, "speaker_similarity.json")))
    assert rep["num_entities"] == 4 and rep["num_utterances"] == 12
    pairs = {(p["a"], p["b"]): p for p in rep["high_similarity_pairs"]}
    assert ("a_1", "b_1") in pairs
    assert pairs[("a_1", "b_1")]["cross_dataset"] is True
    assert rep["num_pairs_above_threshold"] == 1
    mat = np.load(os.path.join(out, "similarity_matrix.npy"))
    assert mat.shape == (4, 4)
    assert os.path.isfile(os.path.join(out, "similarity_analysis.csv"))


def test_train_profile_dir(tiny_exp, tmp_path):
    """--profile_dir writes a TensorBoard-loadable trace of a step window."""
    root, config, rows = tiny_exp
    prof = os.path.join(tmp_path, "prof")
    from speaker3d_tpu.cli.train import main as train_main

    train_main(["--config", os.path.join(root, "cfg.yaml"),
                f"--exp_dir={os.path.join(tmp_path, 'exp_prof')}",
                "--num_epoch=3", "--profile_dir", prof,
                "--profile_steps", "1"])
    traces = []
    for dirpath, _, files in os.walk(prof):
        traces += [f for f in files if f.endswith((".trace.json.gz", ".pb",
                                                   ".json.gz", ".xplane.pb"))]
    assert traces, f"no trace files under {prof}"


def test_extract_nprocs_fanout(tiny_exp, tmp_path):
    """extract --nprocs: per-rank archives named by the env shard rank so
    shards don't overwrite each other (regression: both wrote _0.npz)."""
    root, config, rows = tiny_exp
    scp = os.path.join(tmp_path, "wav.scp")
    with open(scp, "w") as f:
        for rid, p, _ in rows[:3]:
            f.write(f"{rid} {p}\n")
    out_dir = os.path.join(tmp_path, "emb_fan")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    res = subprocess.run(
        [os.sys.executable, "-m", "speaker3d_tpu.cli.extract",
         "--exp_dir", config["exp_dir"], "--data", scp,
         "--out_dir", out_dir, "--mode", "exact", "--nprocs", "2"],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert sorted(os.listdir(out_dir)) == ["embeddings_0.npz",
                                           "embeddings_1.npz"]
    from speaker3d_tpu.eval.scoring import load_embeddings

    assert len(load_embeddings(out_dir)) == 3


def test_infer_sv_pair_and_wavlist(tmp_path):
    """Drive cli/infer_sv end-to-end from a registry model id with a
    random-weight torch checkpoint placed at the modelscope layout,
    covering pair scoring, .npy save, and the wav-list input mode
    (reference: bin/infer_sv.py:313-331)."""
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from speakerlab.models.campplus.DTDNN import CAMPPlus as TorchCAMPPlus

    from speaker3d_tpu.cli.infer_sv import main as infer_main
    from speaker3d_tpu.utils.fileio import write_wav

    model_id = "iic/speech_campplus_sv_zh-cn_16k-common"
    ckpt_dir = os.path.join(tmp_path, "pretrained", model_id)
    os.makedirs(ckpt_dir)
    torch.manual_seed(0)
    tm = TorchCAMPPlus(feat_dim=80, embedding_size=192)
    torch.save(tm.state_dict(),
               os.path.join(ckpt_dir, "campplus_cn_common.bin"))

    rng = np.random.default_rng(0)
    wavs = []
    for i, f0 in enumerate((220.0, 2000.0)):
        w = (0.3 * np.sin(2 * np.pi * f0 * np.arange(FS) / FS)
             + 0.01 * rng.standard_normal(FS)).astype(np.float32)
        p = os.path.join(tmp_path, f"w{i}.wav")
        write_wav(p, w, FS)
        wavs.append(p)

    save_dir = os.path.join(tmp_path, "embs")
    infer_main(["--model_id", model_id,
                "--local_model_dir", os.path.join(tmp_path, "pretrained"),
                "--wavs", *wavs, "--save_dir", save_dir])
    e0 = np.load(os.path.join(save_dir, "w0.npy"))
    e1 = np.load(os.path.join(save_dir, "w1.npy"))
    assert e0.shape == (192,) and np.isfinite(e0).all()
    cos = float(e0 @ e1 / (np.linalg.norm(e0) * np.linalg.norm(e1)))
    assert -1.0 <= cos <= 1.0

    # wav-list mode: one non-.wav argument listing paths
    lst = os.path.join(tmp_path, "wavs.list")
    with open(lst, "w") as f:
        f.write("\n".join(wavs) + "\n")
    save2 = os.path.join(tmp_path, "embs2")
    infer_main(["--model_id", model_id,
                "--local_model_dir", os.path.join(tmp_path, "pretrained"),
                "--wavs", lst, "--save_dir", save2])
    e0b = np.load(os.path.join(save2, "w0.npy"))
    np.testing.assert_allclose(e0b, e0, atol=1e-5)
