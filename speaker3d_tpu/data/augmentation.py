"""Waveform augmentation kernels: additive noise at random SNR, RIR reverb.

Behavioral contract (reference: speakerlab/process/augmentation.py):
  - addreverb: energy-normalized RIR, full-mode convolution truncated to the
    input length, peak-normalized output.
  - addnoise: random SNR in [low, high] dB, noise tiled/cropped to length,
    peak-normalized output.
  - NoiseReverbCorrupter: wav.scp-driven noise/RIR file pools with
    independent application probabilities.

Host-side (numpy/scipy) — this is the CPU data plane feeding device batches.
"""

from __future__ import annotations

import random

import numpy as np
from scipy import signal

from speaker3d_tpu.utils.fileio import load_wav_scp, read_wav


def addreverb(wav: np.ndarray, rir_wav: np.ndarray) -> np.ndarray:
    """(reference: process/augmentation.py:12-22). float32 throughout —
    the reference convolves the torch tensors' float32 numpy views, and the
    parity test pins bitwise equality (float64 here would both diverge and
    cost 2x)."""
    wav = np.asarray(wav, dtype=np.float32)
    rir = np.asarray(rir_wav, dtype=np.float32)
    rir = rir / np.sqrt(np.sum(rir ** 2))
    out = signal.convolve(wav, rir, mode="full")[: wav.shape[0]]
    out = out / (np.max(np.abs(out)) + 1e-6)
    return out.astype(np.float32)


def addnoise(wav: np.ndarray, noise=None, snr_high=15, snr_low=0,
             rng: random.Random = random) -> np.ndarray:
    """(reference: process/augmentation.py:24-48), float32 like the
    reference's numpy views of torch tensors."""
    wav = np.asarray(wav, dtype=np.float32)
    if noise is None:
        noise = np.random.randn(*wav.shape)
    noise = np.asarray(noise, dtype=np.float32)

    wav_len, noise_len = wav.shape[0], noise.shape[0]
    if noise_len >= wav_len:
        start = rng.randint(0, noise_len - wav_len)
        noise = noise[start:start + wav_len]
    else:
        # Reference quirk preserved: `noise.repeat(k)` on an ndarray is
        # ELEMENT-wise repetition (sample-and-hold), not np.tile
        # (reference: process/augmentation.py:37-38). Broadcast-fill form
        # because this numpy build's np.repeat is a scalar loop.
        k = wav_len // noise_len + 1
        noise = np.ascontiguousarray(
            np.broadcast_to(noise[:, None], (noise_len, k))).reshape(-1)
        noise = noise[:wav_len]

    wav_db = 10 * np.log10(np.mean(wav ** 2) + 1e-6)
    noise_db = 10 * np.log10(np.mean(noise ** 2) + 1e-6)
    snr = rng.uniform(snr_low, snr_high)
    noise = np.sqrt(10 ** ((wav_db - noise_db - snr) / 10)) * noise
    out = wav + noise
    out = out / (np.max(np.abs(out)) + 1e-6)
    return out.astype(np.float32)


class NoiseReverbCorrupter:
    """(reference: process/augmentation.py:51-95)"""

    def __init__(self, noise_prob=0.0, reverb_prob=0.0, noise_file=None,
                 reverb_file=None, noise_snr_low=0, noise_snr_high=15):
        if reverb_prob > 0.0:
            if reverb_file is None:
                raise ValueError("reverb_file must be assigned.")
            self.reverb_data = load_wav_scp(reverb_file)
            self.reverb_keys = list(self.reverb_data.keys())
        if noise_prob > 0.0:
            if noise_file is None:
                raise ValueError("noise_file must be assigned.")
            self.noise_data = load_wav_scp(noise_file)
            self.noise_keys = list(self.noise_data.keys())
        self.reverb_prob = reverb_prob
        self.noise_prob = noise_prob
        self.noise_snr_low = noise_snr_low
        self.noise_snr_high = noise_snr_high

    def __call__(self, wav, fs=16000):
        if self.reverb_prob > random.random():
            rir, fs_rir = read_wav(self.reverb_data[random.choice(self.reverb_keys)])
            assert fs_rir == fs
            wav = addreverb(wav, rir[0])
        if self.noise_prob > random.random():
            noise, fs_noise = read_wav(self.noise_data[random.choice(self.noise_keys)])
            assert fs_noise == fs
            wav = addnoise(wav, noise[0], snr_high=self.noise_snr_high,
                           snr_low=self.noise_snr_low)
        return wav
