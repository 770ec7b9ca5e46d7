"""torchaudio-style MelSpectrogram (for the SSL multi-crop pipeline).

Behavioral contract (reference: speakerlab/dataset/dataset_rdino.py:27-36 —
torchaudio.transforms.MelSpectrogram(sample_rate=16000, n_fft=512,
win_length=400, hop_length=160, f_min=0, f_max=8000, n_mels=80)): centered
reflect-padded STFT, periodic Hann window, power-2 spectrum, HTK mel scale,
no filterbank norm. Output layout here is [.., frames, n_mels] (the SSL
backbone takes linear mel and does log+instance-norm itself,
reference: models/rdino/ECAPA_TDNN.py:438-441).

Same TPU-first structure as ops/fbank.py: framing via gcd-blocked strided
slices, analysis as one windowed-DFT matmul, mel projection as a second
matmul — all MXU work.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@dataclasses.dataclass(frozen=True)
class MelSpecConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 400
    hop_length: int = 160
    f_min: float = 0.0
    f_max: float = 8000.0
    n_mels: int = 80
    power: float = 2.0
    center: bool = True


def mel_filterbank(cfg: MelSpecConfig) -> np.ndarray:
    """[n_fft//2+1, n_mels], HTK scale, triangular, no norm (torchaudio
    defaults)."""
    n_freqs = cfg.n_fft // 2 + 1
    all_freqs = np.linspace(0, cfg.sample_rate // 2, n_freqs)
    m_min, m_max = hz_to_mel_htk(cfg.f_min), hz_to_mel_htk(cfg.f_max)
    m_pts = np.linspace(m_min, m_max, cfg.n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]       # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb


def window_dft_matrix(cfg: MelSpecConfig) -> np.ndarray:
    """[n_fft, 2*(n_fft//2+1)] — hann-windowed padded-DFT analysis."""
    # periodic hann over win_length, centered in the n_fft frame (torch.stft
    # pads the window symmetrically to n_fft)
    n = cfg.win_length
    win = 0.5 - 0.5 * np.cos(2 * math.pi * np.arange(n) / n)
    pad_left = (cfg.n_fft - n) // 2
    full_win = np.zeros(cfg.n_fft)
    full_win[pad_left:pad_left + n] = win

    n_bins = cfg.n_fft // 2 + 1
    j = np.arange(cfg.n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * j * k / cfg.n_fft
    d_re = np.cos(ang) * full_win[:, None]
    d_im = -np.sin(ang) * full_win[:, None]
    return np.concatenate([d_re, d_im], axis=1)


class MelSpectrogram:
    def __init__(self, cfg: MelSpecConfig = MelSpecConfig(), dtype=jnp.float32):
        self.cfg = cfg
        self._B = jnp.asarray(window_dft_matrix(cfg), dtype)
        self._mel = jnp.asarray(mel_filterbank(cfg), dtype)

    def __call__(self, wav):
        return _melspec_apply(wav, self._B, self._mel,
                              n_fft=self.cfg.n_fft,
                              hop=self.cfg.hop_length,
                              center=self.cfg.center,
                              power=self.cfg.power)


@partial(jax.jit, static_argnames=("n_fft", "hop", "center", "power"))
def _melspec_apply(wav, B, mel, *, n_fft, hop, center, power):
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if center:
        p = n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (p, p)), mode="reflect")
    from speaker3d_tpu.ops.fbank import _frames

    frames = jax.lax.optimization_barrier(_frames(wav, n_fft, hop))
    y = jnp.matmul(frames, B, precision=jax.lax.Precision.HIGHEST)
    n_bins = mel.shape[0]
    spec = jnp.square(y[..., :n_bins]) + jnp.square(y[..., n_bins:])
    if power != 2.0:
        spec = jnp.power(jnp.maximum(spec, 0.0), power / 2.0)
    out = jnp.matmul(spec, mel, precision=jax.lax.Precision.HIGHEST)
    return out[0] if squeeze else out
