"""Native C++ runtime tests: build (cached), fbank parity vs the Python/TPU
frontend, WAV describe, and the embedded-bridge extract_speaker_embedding CLI.
"""

import os
import subprocess

import numpy as np
import pytest

RUNTIME = "/root/repo/runtime"
BUILD = os.path.join(RUNTIME, "build")


def _built():
    return all(os.path.isfile(os.path.join(BUILD, b)) for b in
               ("make_fbank_feature", "read_and_describe_wav",
                "extract_speaker_embedding", "print_chunk_plan"))


def build_runtime():
    """Build (cached) and return the build dir; importable by other test
    modules (tests/test_export_aot.py chunk-plan lockstep)."""
    if not _built():
        subprocess.run(["cmake", "-B", BUILD, "-G", "Ninja", "."],
                       cwd=RUNTIME, check=True, capture_output=True)
        subprocess.run(["ninja", "-C", BUILD], cwd=RUNTIME, check=True,
                       capture_output=True)
    return BUILD


@pytest.fixture(scope="module")
def binaries():
    return build_runtime()


def _write_wav(path, wav, fs=16000):
    from speaker3d_tpu.utils.fileio import write_wav

    write_wav(path, wav, fs)


def test_native_fbank_matches_python(binaries, tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    wav_path = os.path.join(tmp_path, "a.wav")
    _write_wav(wav_path, wav)

    out_path = os.path.join(tmp_path, "feats.txt")
    subprocess.run([os.path.join(binaries, "make_fbank_feature"), wav_path,
                    out_path, "--mean_norm"], check=True, capture_output=True)
    native = np.loadtxt(out_path)

    # python frontend on the SAME (int16-quantized) samples
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.utils.fileio import read_wav

    decoded, fs = read_wav(wav_path)
    ref = np.asarray(KaldiFbank(FbankConfig(), mean_norm=True)(decoded[0]))
    assert native.shape == ref.shape == (98, 80)
    np.testing.assert_allclose(native, ref, atol=2e-3, rtol=1e-3)


def test_read_and_describe_wav(binaries, tmp_path):
    wav = np.sin(2 * np.pi * 440 * np.arange(8000) / 16000).astype(np.float32)
    wav_path = os.path.join(tmp_path, "tone.wav")
    _write_wav(wav_path, wav * 0.5)
    out = subprocess.run([os.path.join(binaries, "read_and_describe_wav"),
                          wav_path], check=True, capture_output=True,
                         text=True).stdout
    assert "sample_rate: 16000" in out
    assert "duration_s: 0.500" in out


@pytest.mark.skipif(len(__import__("jax").devices()) < 2,
                    reason="needs virtual devices")
def test_extract_speaker_embedding_cli(binaries, tmp_path):
    """Full native path: train a tiny exp, then run the C++ CLI on it."""
    import yaml

    rng = np.random.default_rng(1)
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rows = []
    for s in range(2):
        for u in range(4):
            wav = (0.3 * np.sin(2 * np.pi * (300 + 700 * s)
                                * np.arange(16000) / 16000)
                   + 0.01 * rng.standard_normal(16000)).astype(np.float32)
            p = os.path.join(root, "wav", f"s{s}u{u}.wav")
            _write_wav(p, wav)
            rows.append((f"s{s}u{u}", p, f"spk{s}"))
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("ID,wav,spk\n")
        for rid, p, spk in rows:
            f.write(f"{rid},{p},{spk}\n")
    config = {
        "exp_dir": os.path.join(root, "exp"), "data": os.path.join(root, "train.csv"),
        "wav_len": 0.5, "speed_pertub": False, "aug_prob": 0.0,
        "batch_size": 8, "num_workers": 2, "num_epoch": 1,
        "embedding_size": 16, "max_lr": 0.01, "log_batch_freq": 1,
        "model": {"obj": "speaker3d_tpu.models.xvector.Xvector",
                  "args": {"feat_dim": 80, "hid_dim": 16, "stats_dim": 32,
                           "embed_dim": 16}},
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    from speaker3d_tpu.cli.train import main as train_main

    train_main(["--config", cfg_path])

    scp = os.path.join(root, "wav.scp")
    with open(scp, "w") as f:
        for rid, p, _ in rows[:3]:
            f.write(f"{rid} {p}\n")
    out_dir = os.path.join(root, "embs")
    os.makedirs(out_dir, exist_ok=True)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # hermetic CPU in the subprocess
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [os.path.join(binaries, "extract_speaker_embedding"), scp, out_dir,
         config["exp_dir"], "--repo_root", "/root/repo"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RTF" in r.stderr
    embs = {rid: np.loadtxt(os.path.join(out_dir, f"{rid}.emb"))
            for rid, _, _ in rows[:3]}
    assert all(e.shape == (16,) for e in embs.values())

    # native embedding must match the python exact-mode path
    from speaker3d_tpu.cli.extract import build_model_from_exp
    import jax

    model, variables, _ = build_model_from_exp(config["exp_dir"])
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.utils.fileio import read_wav

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    wav0, _ = read_wav(rows[0][1])
    feats = np.asarray(fbank(wav0[0]))[None]
    with jax.default_matmul_precision("high"):
        ref = np.asarray(model.apply(variables, feats))[0]
    np.testing.assert_allclose(embs[rows[0][0]], ref, atol=5e-3, rtol=1e-2)
