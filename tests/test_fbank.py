import numpy as np
import pytest

from speaker3d_tpu.ops.fbank import FBank, FbankConfig, KaldiFbank
from tests.golden_fbank import golden_fbank


def _wav(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_fbank_matches_golden():
    wav = _wav(16000)
    out = np.asarray(KaldiFbank(FbankConfig())(wav))
    ref = golden_fbank(wav)
    assert out.shape == ref.shape == (98, 80)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fbank_mean_norm():
    wav = _wav(48000, seed=1)
    out = np.asarray(KaldiFbank(FbankConfig(), mean_norm=True)(wav))
    ref = golden_fbank(wav, mean_norm=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)


@pytest.mark.parametrize("window", ["hamming", "hanning", "rectangular"])
def test_fbank_windows(window):
    wav = _wav(8000, seed=2)
    cfg = FbankConfig(window_type=window)
    out = np.asarray(KaldiFbank(cfg)(wav))
    ref = golden_fbank(wav, window_type=window)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fbank_no_power_no_log():
    wav = _wav(8000, seed=3)
    cfg = FbankConfig(use_power=False, use_log_fbank=False)
    out = np.asarray(KaldiFbank(cfg)(wav))
    ref = golden_fbank(wav, use_power=False, use_log=False)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fbank_batched_matches_single():
    wavs = np.stack([_wav(12000, seed=s) for s in range(4)])
    fb = KaldiFbank(FbankConfig())
    batched = np.asarray(fb(wavs))
    singles = np.stack([np.asarray(fb(w)) for w in wavs])
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-6)


def test_frame_count_formula():
    cfg = FbankConfig()
    for n in [400, 401, 559, 560, 561, 16000]:
        fb = KaldiFbank(cfg)
        assert np.asarray(fb(np.zeros(n, np.float32))).shape[0] == cfg.num_frames(n)


def test_fbank_processor_wrapper():
    wav = _wav(16000, seed=4)
    proc = FBank(80, 16000, mean_nor=True)
    out = np.asarray(proc(wav[None]))  # [1, n] channel-first input
    ref = golden_fbank(wav, mean_norm=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fbank_scale_shift_invariance_after_mean_norm():
    # log-mel + mean-norm should be invariant to input scaling
    wav = _wav(16000, seed=5)
    fb = KaldiFbank(FbankConfig(), mean_norm=True)
    a = np.asarray(fb(wav))
    b = np.asarray(fb(wav * 8.0))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
