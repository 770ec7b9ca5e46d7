"""Pallas fused fbank kernel vs the XLA frontend (interpret mode on CPU)."""

import numpy as np

from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
from speaker3d_tpu.ops.pallas.fbank_kernel import pallas_fbank


def test_pallas_fbank_matches_xla_frontend():
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((2, 48000)) * 0.1).astype(np.float32)
    ref = np.asarray(KaldiFbank(FbankConfig())(wavs))
    out = np.asarray(pallas_fbank(wavs, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_fbank_mean_norm_and_1d():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ref = np.asarray(KaldiFbank(FbankConfig(), mean_norm=True)(wav))
    out = np.asarray(pallas_fbank(wav, mean_norm=True, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
