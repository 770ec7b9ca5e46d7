"""DFSMN VAD: model contract, training-learns, chunked inference, pipeline
and CLI integration (new capability — the reference has no VAD trainer)."""

import os

import numpy as np
import pytest
import yaml

FS = 16000


def _speech_like(rng, n, f0=220.0):
    """Harmonic tone with amplitude modulation — separable from noise."""
    t = np.arange(n) / FS
    sig = (np.sin(2 * np.pi * f0 * t) + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
           + 0.25 * np.sin(2 * np.pi * 3 * f0 * t))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t)
    return (0.3 * am * sig + 0.005 * rng.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def vad_exp(tmp_path_factory):
    """Train a tiny DFSMN VAD on synthetic tones-vs-noise via the CLI."""
    from speaker3d_tpu.utils.fileio import write_wav

    root = str(tmp_path_factory.mktemp("vad_exp"))
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    paths = []
    for i in range(6):
        p = os.path.join(root, "wav", f"sp{i}.wav")
        write_wav(p, _speech_like(rng, 2 * FS, f0=180.0 + 60 * i), FS)
        paths.append(p)
    with open(os.path.join(root, "speech.list"), "w") as f:
        f.write("\n".join(paths) + "\n")

    config = {
        "exp_dir": os.path.join(root, "exp"),
        "speech": os.path.join(root, "speech.list"),
        "window_dur": 2.0, "dataset_size": 128, "batch_size": 16,
        "num_workers": 2, "num_epoch": 12, "max_lr": 0.005,
        "warmup_epoch": 1, "snr_range": [10.0, 25.0],
        "model": {"args": {"feat_dim": 80, "hidden_dim": 32, "proj_dim": 16,
                           "num_layers": 2, "lorder": 10, "rorder": 3}},
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    from speaker3d_tpu.cli.train_vad import main as train_main

    train_main(["--config", cfg_path])
    return root, config


def test_fsmn_vad_shapes_and_receptive_field():
    import jax

    from speaker3d_tpu.models.fsmn_vad import FSMNVad

    model = FSMNVad(hidden_dim=32, proj_dim=16, num_layers=2,
                    lorder=4, rorder=2)
    assert model.receptive_field == (8, 4)
    x = np.zeros((3, 50, 80), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (3, 50)

    # receptive field really is finite: perturbing a frame beyond the field
    # does not change the output at frame 25
    x2 = x.copy()
    x2[:, 40] = 5.0  # 15 frames ahead > rorder*num_layers = 4
    out2 = model.apply(variables, x2)
    assert np.allclose(out[:, 25], out2[:, 25], atol=1e-6)
    x3 = x.copy()
    x3[:, 30] = 5.0  # 5 ahead > 4
    out3 = model.apply(variables, x3)
    assert np.allclose(out[:, 25], out3[:, 25], atol=1e-6)
    x4 = x.copy()
    x4[:, 28] = 5.0  # 3 ahead <= 4 -> must change
    out4 = model.apply(variables, x4)
    assert not np.allclose(out[:, 25], out4[:, 25], atol=1e-6)


def test_frame_labels():
    from speaker3d_tpu.data.dataset_vad import frame_labels

    lab = frame_labels([(1600, 4800)], 8000)
    # frame centers at 200 + 160*i; speech frames where center in [1600,4800)
    t = 1 + (8000 - 400) // 160
    assert lab.shape == (t,)
    centers = np.arange(t) * 160 + 200
    assert np.array_equal(lab, ((centers >= 1600) & (centers < 4800)).astype(int))


def test_vad_training_learns_and_dnnvad_detects(vad_exp):
    root, config = vad_exp
    exp_dir = config["exp_dir"]
    # training reached high frame accuracy
    log = open(os.path.join(exp_dir, "train_epoch.log")).read().strip()
    last = log.splitlines()[-1]
    acc = float(last.split("avg_acc:")[1].split(",")[0].strip(" }"))
    assert acc > 0.9, last

    from speaker3d_tpu.diar.dnn_vad import load_vad_exp

    vad = load_vad_exp(exp_dir)
    rng = np.random.default_rng(1)
    sil = (0.002 * rng.standard_normal(FS)).astype(np.float32)
    wav = np.concatenate([sil, _speech_like(rng, 2 * FS, 250.0), sil])
    flags, _ = vad(wav)
    flags = np.asarray(flags, np.float32)
    n = len(flags)
    hop_s = 0.010
    sp_lo, sp_hi = int(1.1 / hop_s), int(2.9 / hop_s)
    assert flags[sp_lo:sp_hi].mean() > 0.85
    assert flags[: int(0.85 / hop_s)].mean() < 0.3
    assert flags[int(3.15 / hop_s):n].mean() < 0.3


def test_dnnvad_chunking_consistency(vad_exp):
    """Chunked execution with context overlap matches a one-window pass."""
    root, config = vad_exp
    from speaker3d_tpu.diar.dnn_vad import load_vad_exp

    vad_small = load_vad_exp(config["exp_dir"], chunk_frames=64)
    vad_big = load_vad_exp(config["exp_dir"], chunk_frames=1024)

    rng = np.random.default_rng(2)
    wav = np.concatenate([
        (0.002 * rng.standard_normal(FS)).astype(np.float32),
        _speech_like(rng, FS, 300.0),
        (0.002 * rng.standard_normal(FS)).astype(np.float32),
    ])
    f_small, _ = vad_small(wav)
    f_big, _ = vad_big(wav)
    assert len(f_small) == len(f_big)
    # absolute features + FIR memory -> exactly chunk-grid invariant
    assert f_small == f_big


def test_dnnvad_in_pipeline(vad_exp):
    """DnnVAD plugs into DiarizationPipeline; frame_ms=10 is honored."""
    root, config = vad_exp
    from speaker3d_tpu.diar import DiarizationPipeline
    from speaker3d_tpu.diar.dnn_vad import load_vad_exp
    from speaker3d_tpu.eval.embedding import build_feature_fn

    feat_fn = build_feature_fn(mean_norm=False)

    def embed(wavs):
        feats = np.asarray(feat_fn(wavs))
        return np.exp(feats).mean(axis=1)

    vad = load_vad_exp(config["exp_dir"])
    pipe = DiarizationPipeline(embed, vad=vad)
    assert pipe.vad_frame_size_ms == 10.0

    rng = np.random.default_rng(3)
    sil = (0.002 * rng.standard_normal(int(0.8 * FS))).astype(np.float32)
    wav = np.concatenate([sil, _speech_like(rng, 3 * FS, 200.0), sil,
                          _speech_like(rng, 3 * FS, 500.0), sil])
    segments = pipe(wav)
    assert segments, "pipeline produced no segments"
    total = sum(ed - st for st, ed, _ in segments)
    assert 5.0 < total < 7.0, segments


def test_short_and_empty_input(vad_exp):
    root, config = vad_exp
    from speaker3d_tpu.diar.dnn_vad import load_vad_exp

    vad = load_vad_exp(config["exp_dir"])
    flags, _ = vad(np.zeros(100, np.float32))  # < one frame
    assert flags == []
    flags, _ = vad(np.zeros(FS // 2, np.float32))  # silence
    assert np.mean(flags) < 0.5
