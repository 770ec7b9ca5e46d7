"""Kaldi-compatible log-mel filterbank features, TPU-native.

Parity target (behavioral contract, see SURVEY.md §2.1):
  - ``torchaudio.compliance.kaldi.fbank(..., dither=0)`` as used by the
    reference FBank processor (reference: speakerlab/process/processor.py:133-158)
  - the reference's from-scratch C++ frontend
    (reference: runtime/onnxruntime/feature/feature_common.cpp:39-162).

TPU-first design
----------------
Everything Kaldi does per frame *before* the power spectrum is linear:

    frame -> [dither=0] -> DC removal -> pre-emphasis -> window -> pad -> rFFT

DC removal is ``I - (1/L) * ones``; pre-emphasis is a banded matrix; the window
is diagonal; zero-padding + rFFT is a (padded) DFT matrix. Their product folds
into ONE precomputed analysis matrix ``B`` of shape ``[frame_len, 2 * n_bins]``
(real ‖ imag). Framing + analysis then becomes a single strided convolution

    y = conv1d(wav, B, stride=frame_shift, padding=VALID)          # MXU

followed by an elementwise power spectrum and one mel-weight matmul (MXU) and a
log. No FFT op, no gathers, no per-frame loop — the whole frontend is two MXU
contractions with static shapes, which XLA fuses and pipelines. On TPU this is
far cheaper than an actual FFT at these sizes (512-point frames), and a single
implementation serves train, eval and serving paths.

Framing itself is done without a gather: ``gcd(frame_length, frame_shift)``
-sized blocks are strided-sliced and concatenated, so overlapping windows are
materialized with cheap strided copies that XLA lowers to plain memory moves.

The matrices are precomputed in float64 on host and stored float32; the
convolution runs at ``Precision.HIGHEST`` so float32 results match the Kaldi
reference to ~1e-5 in the log domain.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# float32 machine epsilon — Kaldi/torchaudio floor the mel energies at this
# value before the log (torch.finfo(torch.float).eps).
_EPSILON = float(np.finfo(np.float32).eps)


def mel_scale(freq):
    """Kaldi mel scale: 1127 * ln(1 + f/700)."""
    return 1127.0 * np.log1p(np.asarray(freq, dtype=np.float64) / 700.0)


def inverse_mel_scale(mel):
    return 700.0 * (np.exp(np.asarray(mel, dtype=np.float64) / 1127.0) - 1.0)


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    """Options mirroring Kaldi FbankOptions / FrameExtractionOptions / MelBanksOptions.

    (reference: runtime/onnxruntime/feature/feature_basic.h:14-94)
    """

    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 80
    low_freq: float = 20.0
    high_freq: float = 0.0  # <= 0 means offset from the Nyquist frequency
    preemphasis_coefficient: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"  # povey|hamming|hanning|rectangular|blackman|sine
    blackman_coeff: float = 0.42
    round_to_power_of_two: bool = True
    use_power: bool = True
    use_log_fbank: bool = True
    snip_edges: bool = True

    def __post_init__(self):
        if not self.snip_edges:
            # num_frames() documents the reflect-padded count but no
            # framing path implements it — reject rather than silently
            # produce snip-edges features under a non-snip config
            raise NotImplementedError(
                "snip_edges=False is not implemented (the reference "
                "pipeline uses snip_edges=True throughout: "
                "processor.py:133, feature_basic.h:40)")

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        n = self.frame_length
        if self.round_to_power_of_two:
            p = 1
            while p < n:
                p *= 2
            return p
        return n

    def num_frames(self, num_samples: int) -> int:
        if self.snip_edges:
            if num_samples < self.frame_length:
                return 0
            return 1 + (num_samples - self.frame_length) // self.frame_shift
        return (num_samples + self.frame_shift // 2) // self.frame_shift


def feature_window(cfg: FbankConfig) -> np.ndarray:
    """The analysis window, float64 [frame_length].

    (reference: runtime/onnxruntime/feature/feature_common.cpp:39-69)
    """
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    wt = cfg.window_type
    if wt == "rectangular":
        return np.ones(n, dtype=np.float64)
    if wt == "hanning":
        return 0.5 - 0.5 * np.cos(a * i)
    if wt == "sine":
        return np.sin(0.5 * a * i)
    if wt == "hamming":
        return 0.54 - 0.46 * np.cos(a * i)
    if wt == "povey":  # like hanning but goes to zero at edges
        return (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    if wt == "blackman":
        bc = cfg.blackman_coeff
        return bc - 0.5 * np.cos(a * i) + (0.5 - bc) * np.cos(2 * a * i)
    raise ValueError(f"unknown window type {wt!r}")


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """Triangular mel filterbank, float64 [n_rfft_bins, num_mel_bins].

    ``n_rfft_bins = padded_window_size // 2 + 1``; the Nyquist row is zero
    (Kaldi computes the banks over bins 0..N/2-1 only).
    (reference: runtime/onnxruntime/feature/feature_common.cpp:84-140)
    """
    nfft = cfg.padded_window_size
    num_fft_bins = nfft // 2
    nyquist = 0.5 * cfg.sample_rate
    low_freq = cfg.low_freq
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    if not (0 <= low_freq < high_freq <= nyquist):
        raise ValueError(f"bad frequency range [{low_freq}, {high_freq}]")

    fft_bin_width = cfg.sample_rate / nfft
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    bin_mels = mel_scale(np.arange(num_fft_bins, dtype=np.float64) * fft_bin_width)
    m = np.arange(cfg.num_mel_bins, dtype=np.float64)
    left = mel_low + m * mel_delta          # [M]
    center = left + mel_delta
    right = center + mel_delta

    up = (bin_mels[:, None] - left[None, :]) / mel_delta
    down = (right[None, :] - bin_mels[:, None]) / mel_delta
    weights = np.maximum(0.0, np.minimum(up, down))

    out = np.zeros((num_fft_bins + 1, cfg.num_mel_bins), dtype=np.float64)
    out[:num_fft_bins] = weights
    return out


def analysis_matrix(cfg: FbankConfig) -> np.ndarray:
    """The folded frame-analysis matrix, float64 [frame_length, 2 * n_bins].

    Columns 0..n_bins-1 produce the real part of the padded rFFT of the
    DC-removed, pre-emphasized, windowed frame; columns n_bins.. produce the
    imaginary part (numpy rfft sign convention).
    """
    L = cfg.frame_length
    nfft = cfg.padded_window_size
    n_bins = nfft // 2 + 1

    # T = diag(window) @ Preemph @ DCRemoval   (applied as T @ frame)
    T = np.eye(L, dtype=np.float64)
    if cfg.remove_dc_offset:
        T = T - np.full((L, L), 1.0 / L, dtype=np.float64)
    coeff = cfg.preemphasis_coefficient
    if coeff != 0.0:
        P = np.eye(L, dtype=np.float64)
        P[0, 0] = 1.0 - coeff  # Kaldi: x[0] -= coeff * x[0]
        for j in range(1, L):
            P[j, j - 1] = -coeff
        T = P @ T
    T = feature_window(cfg)[:, None] * T

    # Padded-DFT rows (only the first L rows matter; the rest multiply zeros).
    j = np.arange(L, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * j * k / nfft
    d_re = np.cos(ang)          # [L, n_bins]
    d_im = -np.sin(ang)

    B = np.concatenate([T.T @ d_re, T.T @ d_im], axis=1)  # [L, 2*n_bins]
    return B


class KaldiFbank:
    """Callable Kaldi-fbank frontend. jit/vmap/shard_map friendly.

    >>> fbank = KaldiFbank(FbankConfig(num_mel_bins=80))
    >>> feats = fbank(wav)            # wav [n] or [batch, n] -> [.., T, 80]
    """

    def __init__(self, cfg: FbankConfig = FbankConfig(), mean_norm: bool = False,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.mean_norm = mean_norm
        n_bins = cfg.padded_window_size // 2 + 1
        self.n_bins = n_bins
        self._B = jnp.asarray(analysis_matrix(cfg), dtype=dtype)      # [L, 2R]
        self._mel = jnp.asarray(mel_banks(cfg), dtype=dtype)          # [R, M]

    def __call__(self, wav, mean_norm: bool | None = None):
        """wav: float array [..., num_samples] -> log-mel [..., num_frames, M]."""
        mean_norm = self.mean_norm if mean_norm is None else mean_norm
        return _fbank_apply(
            wav, self._B, self._mel,
            frame_length=self.cfg.frame_length,
            frame_shift=self.cfg.frame_shift,
            use_power=self.cfg.use_power,
            use_log=self.cfg.use_log_fbank,
            mean_norm=mean_norm,
        )


def _frames(wav, frame_length: int, frame_shift: int):
    """[B, n] -> [B, m, frame_length] overlapping frames, gather-free."""
    n = wav.shape[-1]
    m = 1 + (n - frame_length) // frame_shift
    if m <= 0:  # wav shorter than one frame: 0 frames (num_frames contract)
        return jnp.zeros((wav.shape[0], 0, frame_length), wav.dtype)
    g = math.gcd(frame_length, frame_shift)
    step = frame_shift // g
    nb = (frame_shift * (m - 1) + frame_length) // g
    blocks = wav[:, : nb * g].reshape(wav.shape[0], nb, g)
    cols = [
        jax.lax.slice_in_dim(blocks, k, k + step * (m - 1) + 1, stride=step, axis=1)
        for k in range(frame_length // g)
    ]
    return jnp.concatenate(cols, axis=2)


@partial(jax.jit, static_argnames=(
    "frame_length", "frame_shift", "use_power", "use_log", "mean_norm"))
def _fbank_apply(wav, B, mel, *, frame_length, frame_shift, use_power, use_log,
                 mean_norm):
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    lead = wav.shape[:-1]
    wav = wav.reshape((-1, wav.shape[-1]))

    n_bins = mel.shape[0]
    frames = _frames(wav, frame_length, frame_shift)   # [B, T, L]
    # The barrier stops XLA from folding the strided-slice framing into the
    # dot below — a composition that triggers a pathologically slow
    # compilation pass on the CPU backend; on TPU it merely materializes the
    # frames once, which is cheap relative to the analysis matmul.
    frames = jax.lax.optimization_barrier(frames)
    # Per-frame linear analysis (dc-removal/preemph/window/rFFT) as ONE matmul.
    y = jnp.matmul(frames, B, precision=jax.lax.Precision.HIGHEST)  # [B, T, 2R]
    power = jnp.square(y[..., :n_bins]) + jnp.square(y[..., n_bins:])
    if not use_power:
        power = jnp.sqrt(power)
    feats = jnp.matmul(power, mel, precision=jax.lax.Precision.HIGHEST)
    if use_log:
        feats = jnp.log(jnp.maximum(feats, _EPSILON))
    if mean_norm:
        feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
    feats = feats.reshape(lead + feats.shape[1:])
    return feats[0] if squeeze else feats


class FBank:
    """Drop-in behavioral equivalent of the reference FBank processor.

    (reference: speakerlab/process/processor.py:133-158 — 80-mel Kaldi fbank,
    optional per-utterance mean normalization over time, dither=0.)
    """

    def __init__(self, n_mels: int = 80, sample_rate: int = 16000,
                 mean_nor: bool = False):
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        self.mean_nor = mean_nor
        self._fbank = KaldiFbank(
            FbankConfig(sample_rate=sample_rate, num_mel_bins=n_mels),
            mean_norm=mean_nor,
        )

    def __call__(self, wav, dither: float = 0.0):
        del dither  # inference path is dither-free, matching the reference
        wav = jnp.asarray(wav)
        if wav.ndim == 2 and wav.shape[0] == 1:  # [1, n] channel-first mono
            wav = wav[0]
        return self._fbank(wav)
