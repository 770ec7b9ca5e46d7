import math

import numpy as np
import pytest

from speaker3d_tpu.ops.melspec import MelSpecConfig, MelSpectrogram


def golden_melspec(wav, cfg: MelSpecConfig):
    """Step-by-step numpy reference (torchaudio MelSpectrogram semantics)."""
    wav = np.asarray(wav, np.float64)
    p = cfg.n_fft // 2
    wav = np.pad(wav, (p, p), mode="reflect")
    n = cfg.win_length
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)  # periodic hann
    full = np.zeros(cfg.n_fft)
    full[(cfg.n_fft - n) // 2:(cfg.n_fft - n) // 2 + n] = win
    m = 1 + (len(wav) - cfg.n_fft) // cfg.hop_length
    frames = np.stack([wav[i * cfg.hop_length:i * cfg.hop_length + cfg.n_fft]
                       for i in range(m)])
    spec = np.abs(np.fft.rfft(frames * full, axis=1)) ** 2

    n_freqs = cfg.n_fft // 2 + 1
    freqs = np.linspace(0, cfg.sample_rate / 2, n_freqs)
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    mel2hz = lambda mm: 700.0 * (10.0 ** (np.asarray(mm) / 2595.0) - 1.0)
    pts = mel2hz(np.linspace(hz2mel(cfg.f_min), hz2mel(cfg.f_max),
                             cfg.n_mels + 2))
    fb = np.zeros((n_freqs, cfg.n_mels))
    for i in range(cfg.n_mels):
        lo, ce, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / (ce - lo)
        down = (hi - freqs) / (hi - ce)
        fb[:, i] = np.maximum(0, np.minimum(up, down))
    return spec @ fb


def test_melspec_matches_golden():
    cfg = MelSpecConfig()
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(
        np.float32)
    out = np.asarray(MelSpectrogram(cfg)(wav))
    ref = golden_melspec(wav, cfg)
    assert out.shape == ref.shape == (101, 80)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-6)


def test_ssl_datasets(tmp_path):
    import os

    from speaker3d_tpu.data.dataset_ssl import (
        RDINODataset,
        SDPNDataset,
        SSLBatchLoader,
    )
    from speaker3d_tpu.utils.fileio import write_wav

    fs = 16000
    rng = np.random.default_rng(0)
    scp = os.path.join(tmp_path, "wav.scp")
    with open(scp, "w") as f:
        for i in range(6):
            path = os.path.join(tmp_path, f"u{i}.wav")
            write_wav(path, rng.standard_normal(5 * fs).astype(np.float32) * 0.1,
                      fs)
            f.write(f"u{i} {path}\n")

    ds = RDINODataset(scp, max_frames=400, glb_num=2, local_num=4)
    sample = ds[0]
    assert sample["global_wavs"].shape == (2, 400 * 160)
    assert sample["local_wavs"].shape == (4, 200 * 160)

    ds2 = SDPNDataset(scp, max_frames=400, glb_num=1, local_num=4)
    s2 = ds2[1]
    assert s2["global_wavs"].shape == (1, 400 * 160)

    loader = SSLBatchLoader(ds, batch_size=3, num_workers=2)
    batch = next(iter(loader))
    # sample-major: [B, n_crops, L]
    assert batch["global_wavs"].shape == (3, 2, 64000)
    assert batch["local_wavs"].shape == (3, 4, 32000)
