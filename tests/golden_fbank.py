"""Independent step-by-step numpy implementation of Kaldi fbank (float64).

Used as the golden reference for the folded-matmul TPU frontend. Follows the
Kaldi algorithm exactly as implemented by torchaudio.compliance.kaldi.fbank
and the reference C++ frontend
(reference: runtime/onnxruntime/feature/feature_common.cpp:39-162):

  frame (snip_edges) -> [dither] -> remove DC -> pre-emphasis -> window
  -> zero-pad to pow2 -> rFFT -> power -> mel banks -> log(max(., eps))
"""

import numpy as np

EPS = float(np.finfo(np.float32).eps)


def mel(f):
    return 1127.0 * np.log1p(np.asarray(f, dtype=np.float64) / 700.0)


def golden_fbank(
    wav,
    sample_rate=16000,
    frame_length_ms=25.0,
    frame_shift_ms=10.0,
    num_mel_bins=80,
    low_freq=20.0,
    high_freq=0.0,
    preemph=0.97,
    remove_dc=True,
    window_type="povey",
    round_to_pow2=True,
    use_power=True,
    use_log=True,
    mean_norm=False,
):
    wav = np.asarray(wav, dtype=np.float64)
    L = int(sample_rate * frame_length_ms / 1000)
    S = int(sample_rate * frame_shift_ms / 1000)
    n = len(wav)
    m = 1 + (n - L) // S
    assert m >= 1

    nfft = L
    if round_to_pow2:
        nfft = 1
        while nfft < L:
            nfft *= 2

    i = np.arange(L, dtype=np.float64)
    a = 2 * np.pi / (L - 1)
    if window_type == "povey":
        win = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif window_type == "hamming":
        win = 0.54 - 0.46 * np.cos(a * i)
    elif window_type == "hanning":
        win = 0.5 - 0.5 * np.cos(a * i)
    elif window_type == "rectangular":
        win = np.ones(L)
    else:
        raise ValueError(window_type)

    frames = np.stack([wav[j * S: j * S + L].copy() for j in range(m)])
    if remove_dc:
        frames -= frames.mean(axis=1, keepdims=True)
    if preemph != 0.0:
        shifted = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemph * shifted
    frames *= win

    spec = np.fft.rfft(frames, n=nfft, axis=1)
    power = np.abs(spec) ** 2
    if not use_power:
        power = np.sqrt(power)

    # mel banks over bins 0..nfft/2-1 (nyquist excluded)
    num_fft_bins = nfft // 2
    nyq = sample_rate / 2
    hi = high_freq if high_freq > 0 else nyq + high_freq
    mlo, mhi = mel(low_freq), mel(hi)
    d = (mhi - mlo) / (num_mel_bins + 1)
    bank = np.zeros((num_fft_bins + 1, num_mel_bins))
    bin_m = mel(np.arange(num_fft_bins) * sample_rate / nfft)
    for b in range(num_mel_bins):
        left, center, right = mlo + b * d, mlo + (b + 1) * d, mlo + (b + 2) * d
        up = (bin_m - left) / (center - left)
        down = (right - bin_m) / (right - center)
        bank[:num_fft_bins, b] = np.maximum(0, np.minimum(up, down))

    feats = power @ bank
    if use_log:
        feats = np.log(np.maximum(feats, EPS))
    if mean_norm:
        feats = feats - feats.mean(axis=0, keepdims=True)
    return feats
