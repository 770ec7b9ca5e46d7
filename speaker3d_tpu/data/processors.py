"""Host-side data processors: wav reading/cropping, speed perturbation,
speaker label encoding, augmentation selection.

Behavioral contract (reference: speakerlab/process/processor.py):
  - WavReader: load, assert 16 kHz, optional speed perturb 0.9/1.0/1.1
    (treated as new speaker classes downstream), random fixed-duration crop,
    zero-pad short utterances. Speed perturbation here uses polyphase
    resampling (sox `speed` == playback-rate change == resampling by 1/speed,
    numerically equivalent up to the resampler's filter).
  - SpkLabelEncoder: speaker -> int id from the CSV index; speed-perturb
    multiplies the label space x3 (spkid + N * speed_idx); picklable.
  - SpkVeriAug: with prob aug_prob apply one of {noise, rir, rir+noise}.

The FBank processor lives in speaker3d_tpu.ops.fbank (device path) — the
training pipeline feeds raw wav crops to the device and fuses fbank into the
train step.
"""

from __future__ import annotations

import pickle
import random

import numpy as np

from speaker3d_tpu.data.augmentation import NoiseReverbCorrupter
from speaker3d_tpu.utils.fileio import load_data_csv, read_wav, resample


def speed_perturb(wav: np.ndarray, speed: float, sample_rate: int = 16000):
    """sox `speed S` ≡ resample by 1/S played at the original rate."""
    if speed == 1.0:
        return wav
    from speaker3d_tpu.data.resample import (
        out_len,
        resample_poly_segment,
        speed_ratio,
    )

    # speed 0.9 -> longer (x 1/0.9); 1.1 -> shorter
    num, den = speed_ratio(speed)
    return resample_poly_segment(wav, num, den, 0,
                                 out_len(len(wav), num, den))


class WavReader:
    """(reference: process/processor.py:15-52)"""

    def __init__(self, sample_rate=16000, duration: float = 3.0,
                 speed_pertub: bool = False, lm: bool = True):
        self.sample_rate = sample_rate
        self.duration = duration
        self.speed_pertub = speed_pertub
        self.lm = lm

    def __call__(self, wav_path):
        wav, sr = read_wav(wav_path)
        assert sr == self.sample_rate, (wav_path, sr)
        wav = wav[0]

        if self.speed_pertub and self.lm:
            speeds = [1.0, 0.9, 1.1]
            speed_idx = random.randint(0, 2)
        else:
            speed_idx = 0

        chunk_len = int(self.duration * sr)
        if speed_idx > 0:
            # Resample-then-crop, computed as crop-targeted resampling: the
            # crop start is drawn over the ANALYTIC resampled length (same
            # RNG call and bounds as resampling first), then only the
            # crop's receptive field is filtered (data/resample.py) — the
            # values match full-signal resample_poly within float32
            # reassociation.
            from speaker3d_tpu.data.resample import (
                out_len,
                resample_poly_segment,
                speed_ratio,
            )

            num, den = speed_ratio(speeds[speed_idx])
            data_len = out_len(wav.shape[0], num, den)
            if data_len >= chunk_len:
                start = random.randint(0, data_len - chunk_len)
                wav = resample_poly_segment(wav, num, den, start, chunk_len)
            else:
                wav = resample_poly_segment(wav, num, den, 0, data_len)
                wav = np.pad(wav, (0, chunk_len - data_len))
            return wav.astype(np.float32), speed_idx

        data_len = wav.shape[0]
        if data_len >= chunk_len:
            start = random.randint(0, data_len - chunk_len)
            wav = wav[start:start + chunk_len]
        else:
            wav = np.pad(wav, (0, chunk_len - data_len))
        return wav.astype(np.float32), speed_idx


class SpkLabelEncoder:
    """(reference: process/processor.py:54-95)"""

    def __init__(self, data_file=None):
        self.lab2ind = {}
        self.ind2lab = {}
        self.starting_index = -1
        if data_file is not None:
            self.load_from_csv(data_file)

    def __call__(self, spk, speed_idx=0):
        return self.lab2ind[spk] + len(self.lab2ind) * speed_idx

    def load_from_csv(self, path):
        self.data = load_data_csv(path)
        for key in self.data:
            self.add(self.data[key]["spk"])

    def add(self, label):
        if label in self.lab2ind:
            return
        self.starting_index += 1
        self.lab2ind[label] = self.starting_index
        self.ind2lab[self.starting_index] = label

    def __len__(self):
        return len(self.lab2ind)

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.lab2ind, f)

    def load(self, path):
        with open(path, "rb") as f:
            self.lab2ind = pickle.load(f)
        self.ind2lab = {v: k for k, v in self.lab2ind.items()}


class SpkVeriAug:
    """(reference: process/processor.py:98-130)"""

    def __init__(self, aug_prob: float = 0.0, noise_file=None, reverb_file=None):
        self.aug_prob = aug_prob
        if aug_prob > 0:
            self.augmentations = [
                NoiseReverbCorrupter(noise_prob=1.0, noise_file=noise_file),
                NoiseReverbCorrupter(reverb_prob=1.0, reverb_file=reverb_file),
                NoiseReverbCorrupter(noise_prob=1.0, reverb_prob=1.0,
                                     noise_file=noise_file,
                                     reverb_file=reverb_file),
            ]

    def __call__(self, wav):
        if self.aug_prob > random.random():
            return random.choice(self.augmentations)(wav, 16000)
        return wav
