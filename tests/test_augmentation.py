"""Waveform augmentation kernels vs the reference's own functions.

Pins data/augmentation.py::{addreverb, addnoise} BITWISE against the
reference implementations (reference: speakerlab/process/augmentation.py:
12-48) — including the reference's float32 compute path (numpy views of
torch tensors) and its short-noise quirk: ``ndarray.repeat(k)`` is
ELEMENT-wise repetition (sample-and-hold), not tiling.
"""

import random
import sys
import types

import numpy as np
import pytest

from speaker3d_tpu.data.augmentation import addnoise, addreverb
from tests.conftest import has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")


def _ref_augmentation():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "torchaudio" not in sys.modules:
        mod = types.ModuleType("torchaudio")
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
        sys.modules["torchaudio"] = mod
    import importlib

    return importlib.import_module("speakerlab.process.augmentation")


def test_addreverb_bitwise():
    import torch

    ref = _ref_augmentation()
    rng = np.random.default_rng(0)
    for n_rir in (512, 8000):
        wav = rng.standard_normal(48000).astype(np.float32)
        rir = (rng.standard_normal(n_rir)
               * np.exp(-np.arange(n_rir) / 2000)).astype(np.float32)
        ours = addreverb(wav, rir)
        theirs = ref.addreverb(torch.from_numpy(wav.copy()),
                               torch.from_numpy(rir.copy())).numpy()
        np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("noise_len", [60000, 48000, 7000, 48001])
def test_addnoise_bitwise(noise_len):
    """Long noise (random crop), exact length, and the short-noise
    element-repeat branch; the global-random stream is replayed so the
    crop start and SNR draws match."""
    import torch

    ref = _ref_augmentation()
    rng = np.random.default_rng(noise_len)
    wav = rng.standard_normal(48000).astype(np.float32)
    noise = rng.standard_normal(noise_len).astype(np.float32)

    random.seed(7)
    ours = addnoise(wav, noise, snr_high=15, snr_low=0)
    random.seed(7)
    theirs = ref.addnoise(torch.from_numpy(wav.copy()),
                          torch.from_numpy(noise.copy()),
                          snr_high=15, snr_low=0).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_addnoise_short_is_sample_hold():
    """The short-noise branch repeats each sample, not the whole clip."""
    wav = np.zeros(8, np.float32)
    wav[0] = 1.0  # non-degenerate energy
    noise = np.array([1.0, -1.0], np.float32)
    random.seed(0)
    out = addnoise(wav, noise, snr_high=0, snr_low=0)
    # sample-and-hold pattern: + + + + - - - - (element repeat k=5 -> crop),
    # NOT the tile pattern + - + - ...
    assert np.all(np.sign(out[1:5]) == 1.0) and np.all(
        np.sign(out[5:]) == -1.0), out
