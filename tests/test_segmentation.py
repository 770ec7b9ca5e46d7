"""FSMN overlap segmentation: PIT loss, dataset, training-learns, sliding
inference contract, pipeline integration (new capability — the reference's
overlap detection is an external pyannote download)."""

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
def seg_exp(tmp_path_factory):
    """Train a tiny FSMN segmenter on 3 synthetic tone 'speakers'."""
    from speaker3d_tpu.utils.fileio import write_wav

    root = str(tmp_path_factory.mktemp("seg_exp"))
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    f0s = {"spkA": 180.0, "spkB": 420.0, "spkC": 900.0}
    rows = []
    for spk, f0 in f0s.items():
        for u in range(3):
            p = os.path.join(root, "wav", f"{spk}u{u}.wav")
            write_wav(p, _speech_like(rng, 2 * FS, f0 * (1 + 0.03 * u)), FS)
            rows.append((f"{spk}u{u}", p, spk))
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("ID,wav,spk\n")
        for r in rows:
            f.write(",".join(r) + "\n")

    config = {
        "exp_dir": os.path.join(root, "exp"),
        "speech": os.path.join(root, "train.csv"),
        "window_dur": 2.0, "max_speakers": 2, "events_per_speaker": 1,
        "dataset_size": 128, "batch_size": 16, "num_workers": 2,
        "num_epoch": 12, "max_lr": 0.005, "warmup_epoch": 1,
        "snr_range": [10.0, 25.0],
        "model": {"args": {"feat_dim": 80, "hidden_dim": 32, "proj_dim": 16,
                           "num_layers": 2, "lorder": 10, "rorder": 10}},
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    from speaker3d_tpu.cli.train_segmentation import main as train_main

    train_main(["--config", cfg_path])
    return root, config, f0s


def test_segmenter_shapes():
    import jax

    from speaker3d_tpu.models.segmentation import FSMNSegmenter

    model = FSMNSegmenter(hidden_dim=32, proj_dim=16, num_layers=2,
                          lorder=4, rorder=2, max_speakers=3)
    assert model.receptive_field == (8, 4)
    x = np.zeros((2, 50, 80), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 50, 3)


def test_pit_bce_permutation_invariance():
    import jax.numpy as jnp

    from speaker3d_tpu.models.segmentation import pit_bce

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 30, 3)).astype(np.float32))
    labels = (rng.random((4, 30, 3)) > 0.6).astype(np.float32)

    loss_a, _ = pit_bce(logits, jnp.asarray(labels))
    # permuting label channels must not change the PIT loss
    loss_b, _ = pit_bce(logits, jnp.asarray(labels[:, :, [2, 0, 1]]))
    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b),
                               rtol=1e-6)

    # with labels = hard version of logits under a known permutation, the
    # assignment must recover that permutation
    perm = [1, 2, 0]
    hard = np.asarray(logits > 0, np.float32)[:, :, perm]
    _, assignment = pit_bce(logits, jnp.asarray(hard))
    assert np.all(np.asarray(assignment) == np.argsort(perm)[None]), (
        np.asarray(assignment))


def test_seg_dataset_labels(tmp_path):
    from speaker3d_tpu.data.dataset_seg import SyntheticSegmentationDataset
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(0)
    rows = []
    for s, f0 in enumerate([200.0, 500.0, 800.0]):
        p = os.path.join(tmp_path, f"s{s}.wav")
        write_wav(p, _speech_like(rng, FS, f0), FS)
        rows.append((f"s{s}", p, f"spk{s}"))
    csv = os.path.join(tmp_path, "train.csv")
    with open(csv, "w") as f:
        f.write("ID,wav,spk\n")
        for r in rows:
            f.write(",".join(r) + "\n")

    ds = SyntheticSegmentationDataset(csv, window_dur=2.0, max_speakers=3,
                                      size=32, seed=1)
    t = 1 + (2 * FS - 400) // 160
    seen_overlap = False
    seen_multi = False
    for i in range(len(ds)):
        wav, lab = ds[i]
        assert wav.shape == (2 * FS,) and lab.shape == (t, 3)
        assert set(np.unique(lab)) <= {0, 1}
        if (lab.sum(-1) >= 2).any():
            seen_overlap = True
        if (lab.any(0).sum()) >= 2:
            seen_multi = True
        # determinism
        wav2, lab2 = ds[i]
        np.testing.assert_array_equal(lab, lab2)
        np.testing.assert_array_equal(wav, wav2)
    assert seen_multi, "no multi-speaker windows generated in 32 draws"
    assert seen_overlap, "no overlapping frames generated in 32 draws"


def test_seg_training_learns(seg_exp):
    root, config, f0s = seg_exp
    log = open(os.path.join(config["exp_dir"],
                            "train_epoch.log")).read().strip()
    last = log.splitlines()[-1]
    acc = float(last.split("avg_acc:")[1].split(",")[0].strip(" }"))
    assert acc > 0.8, last


def test_dnn_segmenter_contract(seg_exp):
    """SlidingSegmentation invariants: shapes, grid-aligned starts, and
    aggregate_count consuming the output."""
    root, config, f0s = seg_exp
    from speaker3d_tpu.diar.dnn_seg import load_segmentation_exp
    from speaker3d_tpu.diar.overlap import aggregate_count

    seg_model = load_segmentation_exp(config["exp_dir"], step_dur=0.5)
    rng = np.random.default_rng(1)
    wav = np.concatenate([
        (0.002 * rng.standard_normal(FS)).astype(np.float32),
        _speech_like(rng, 2 * FS, 180.0),
        (0.002 * rng.standard_normal(FS)).astype(np.float32),
    ])
    seg = seg_model(wav, FS)
    assert seg.data.ndim == 3 and seg.data.shape[2] == 2
    assert seg.frame_step == pytest.approx(0.01)
    assert np.all(seg.data >= 0) and np.all(seg.data <= 1)
    # starts on the 10 ms grid, step 0.5 s
    np.testing.assert_allclose(np.diff(seg.chunk_starts), 0.5, atol=1e-9)
    num_frames = int(np.ceil(len(wav) / FS / seg.frame_step))
    count = aggregate_count(seg, num_frames)
    assert len(count) == num_frames
    # speech region counted as >=1 speaker, edges as 0
    mid = count.data[150:250]
    assert mid.mean() > 0.6, count.data
    assert count.data[:60].mean() < 0.4


def test_dnn_segmenter_detects_overlap(seg_exp):
    """Two concurrent tone speakers -> >=2 active channels in the overlap."""
    root, config, f0s = seg_exp
    from speaker3d_tpu.diar.dnn_seg import load_segmentation_exp
    from speaker3d_tpu.diar.overlap import aggregate_count

    seg_model = load_segmentation_exp(config["exp_dir"], step_dur=0.5)
    rng = np.random.default_rng(2)
    a = _speech_like(rng, 3 * FS, 180.0)
    b = _speech_like(rng, 3 * FS, 900.0)
    sil = (0.002 * rng.standard_normal(FS)).astype(np.float32)
    # A alone 1-2.5 s, A+B overlap 2.5-4 s, B alone 4-5.5 s
    wav = np.concatenate([sil, a, np.zeros(int(1.5 * FS), np.float32), sil])
    wav[int(2.5 * FS):int(5.5 * FS)] += b
    seg = seg_model(wav, FS)
    num_frames = int(np.ceil(len(wav) / FS / seg.frame_step))
    count = aggregate_count(seg, num_frames)
    overlap_counts = count.data[int(2.7 / 0.01):int(3.8 / 0.01)]
    solo_counts = count.data[int(1.2 / 0.01):int(2.3 / 0.01)]
    assert overlap_counts.mean() > solo_counts.mean(), (
        overlap_counts.mean(), solo_counts.mean())
    assert overlap_counts.mean() > 1.3, overlap_counts.mean()


def test_pipeline_overlap_integration(seg_exp):
    """DnnSegmenter drives the overlap-aware post-processing end-to-end and
    produces time-overlapping output segments."""
    root, config, f0s = seg_exp
    from speaker3d_tpu.diar import DiarizationPipeline
    from speaker3d_tpu.diar.dnn_seg import load_segmentation_exp
    from speaker3d_tpu.eval.embedding import build_feature_fn

    feat_fn = build_feature_fn(mean_norm=False)

    def embed(wavs):
        feats = np.asarray(feat_fn(wavs))
        return np.exp(feats).mean(axis=1)

    seg_model = load_segmentation_exp(config["exp_dir"], step_dur=0.5)
    pipe = DiarizationPipeline(embed, segmentation_model=seg_model,
                               speaker_num=2)
    rng = np.random.default_rng(3)
    a = _speech_like(rng, 3 * FS, 180.0)
    b = _speech_like(rng, 3 * FS, 900.0)
    sil = (0.002 * rng.standard_normal(FS)).astype(np.float32)
    wav = np.concatenate([sil, a, np.zeros(int(1.5 * FS), np.float32), sil])
    wav[int(2.5 * FS):int(5.5 * FS)] += b
    segments = pipe(wav, speaker_num=2)
    assert segments, "no segments produced"
    # some pair of segments from different speakers overlaps in time
    overlap = 0.0
    for i, (s1, e1, k1) in enumerate(segments):
        for s2, e2, k2 in segments[i + 1:]:
            if k1 != k2:
                overlap = max(overlap, min(e1, e2) - max(s1, s2))
    assert overlap > 0.3, segments


def test_cli_include_overlap_requires_exp(tmp_path):
    from speaker3d_tpu.cli.infer_diarization import main as diar_main

    with pytest.raises(SystemExit):
        diar_main(["--wav", os.path.join(tmp_path, "x.wav"),
                   "--out_dir", str(tmp_path), "--include_overlap"])


def test_cli_trained_vad_plus_overlap(seg_exp, tmp_path):
    """Full CLI with BOTH in-framework models: --vad_exp_dir (DFSMN VAD)
    and --include_overlap (FSMN segmenter) on an overlapping mixture."""
    import yaml

    from speaker3d_tpu.utils.fileio import write_wav

    root, config, f0s = seg_exp
    # train a tiny DFSMN VAD on the same tone corpus
    vad_cfg = {
        "exp_dir": os.path.join(tmp_path, "vad_exp"),
        "speech": config["speech"],
        "window_dur": 2.0, "dataset_size": 128, "batch_size": 16,
        "num_workers": 2, "num_epoch": 10, "max_lr": 0.005,
        "warmup_epoch": 1, "snr_range": [10.0, 25.0],
        "model": {"args": {"feat_dim": 80, "hidden_dim": 32, "proj_dim": 16,
                           "num_layers": 2, "lorder": 10, "rorder": 3}},
    }
    vad_cfg_path = os.path.join(tmp_path, "vad_cfg.yaml")
    with open(vad_cfg_path, "w") as f:
        yaml.safe_dump(vad_cfg, f)
    from speaker3d_tpu.cli.train_vad import main as vad_main

    vad_main(["--config", vad_cfg_path])

    # overlap conversation: A alone, A+B, B alone
    rng = np.random.default_rng(5)
    a = _speech_like(rng, 3 * FS, 180.0)
    b = _speech_like(rng, 3 * FS, 900.0)
    sil = (0.002 * rng.standard_normal(FS)).astype(np.float32)
    wav = np.concatenate([sil, a, np.zeros(int(1.5 * FS), np.float32), sil])
    wav[int(2.5 * FS):int(5.5 * FS)] += b
    wav_path = os.path.join(tmp_path, "conv.wav")
    write_wav(wav_path, wav, FS)

    # tiny SV exp for embeddings
    sv_cfg = {
        "exp_dir": os.path.join(tmp_path, "sv_exp"),
        "data": config["speech"],
        "wav_len": 0.5, "speed_pertub": False, "aug_prob": 0.0,
        "batch_size": 8, "num_workers": 2, "num_epoch": 2,
        "embedding_size": 16, "max_lr": 0.05, "min_lr": 0.005,
        "warmup_epoch": 1, "log_batch_freq": 1,
        "model": {"obj": "speaker3d_tpu.models.xvector.Xvector",
                  "args": {"feat_dim": 80, "hid_dim": 16, "stats_dim": 32,
                           "embed_dim": 16}},
    }
    sv_cfg_path = os.path.join(tmp_path, "sv_cfg.yaml")
    with open(sv_cfg_path, "w") as f:
        yaml.safe_dump(sv_cfg, f)
    from speaker3d_tpu.cli.train import main as train_main

    train_main(["--config", sv_cfg_path])

    from speaker3d_tpu.cli.infer_diarization import main as diar_main

    out_dir = os.path.join(tmp_path, "out")
    diar_main(["--wav", wav_path, "--out_dir", out_dir,
               "--exp_dir", sv_cfg["exp_dir"],
               "--vad_exp_dir", vad_cfg["exp_dir"],
               "--include_overlap",
               "--segmentation_exp_dir", config["exp_dir"],
               "--speaker_num", "2", "--out_type", "rttm", "--sidecar"])
    rttm = os.path.join(out_dir, "conv.rttm")
    assert os.path.isfile(rttm)
    lines = open(rttm).read().strip().splitlines()
    assert lines, "empty rttm"
    # speech was found roughly where the tones are
    total = sum(float(l.split()[4]) for l in lines)
    assert 3.0 < total < 9.5, (total, lines)
    assert os.path.isfile(os.path.join(out_dir, "conv.meta.json"))
