"""Segment-targeted polyphase resampler (data/resample.py + the native
kernel runtime/src/hostops.cpp) vs scipy.signal.resample_poly.

The training loader's speed perturbation must keep sox-equivalent
semantics (reference: speakerlab/process/processor.py:30-52 resamples the
whole utterance with sox `speed`, then random-crops). The fast path crops
first and filters only the receptive field — these tests pin that the
result is the full-resample result (same filter design, same crop RNG
stream) within float32 reassociation.
"""

import numpy as np
import pytest
from scipy.signal import resample_poly

from speaker3d_tpu.data.resample import (
    _native_lib,
    out_len,
    resample_poly_segment,
    speed_ratio,
)

TOL = 2e-6


def _build_native():
    import sys

    sys.path.insert(0, "tests")
    from test_native_runtime import build_runtime

    build_runtime()
    _native_lib.cache_clear()


@pytest.fixture(scope="module", params=["native", "fallback"])
def backend(request):
    if request.param == "native":
        _build_native()
        if _native_lib() is None:
            pytest.skip("native hostops lib unavailable")
        yield "native"
        return
    import os

    old = os.environ.get("S3D_HOSTOPS_LIB")
    os.environ["S3D_HOSTOPS_LIB"] = "/nonexistent.so"
    _native_lib.cache_clear()
    assert _native_lib() is None
    yield "fallback"
    if old is None:
        os.environ.pop("S3D_HOSTOPS_LIB", None)
    else:
        os.environ["S3D_HOSTOPS_LIB"] = old
    _native_lib.cache_clear()


@pytest.mark.parametrize("up,down", [(10, 9), (10, 11)])
@pytest.mark.parametrize("n", [1531, 47999, 64007])
def test_segment_matches_scipy(backend, up, down, n):
    rng = np.random.default_rng(n * up + down)
    x = rng.standard_normal(n).astype(np.float32)
    ref = resample_poly(x, up, down).astype(np.float32)
    assert len(ref) == out_len(n, up, down)
    for o0 in (0, 1, 7, max(0, len(ref) - 500)):
        n_out = min(500, len(ref) - o0)
        got = resample_poly_segment(x, up, down, o0, n_out)
        np.testing.assert_allclose(got, ref[o0:o0 + n_out], atol=TOL,
                                   rtol=0)
    # whole-range call == scipy end to end (speed_perturb path)
    got = resample_poly_segment(x, up, down, 0, len(ref))
    np.testing.assert_allclose(got, ref, atol=TOL, rtol=0)


def test_segment_bounds_checked():
    x = np.zeros(1000, np.float32)
    with pytest.raises(ValueError):
        resample_poly_segment(x, 10, 9, 0, out_len(1000, 10, 9) + 1)
    with pytest.raises(ValueError):
        resample_poly_segment(x, 10, 9, -1, 10)


def test_wavreader_crop_equals_resample_then_crop(tmp_path):
    """WavReader's fast path draws the same RNG stream and yields the same
    crop as the reference order (full resample, then crop)."""
    import random

    from speaker3d_tpu.data.processors import WavReader
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(7)
    n = 5 * 16000
    wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(str(p), wav, 16000)
    decoded = None
    from speaker3d_tpu.utils.fileio import read_wav

    decoded = read_wav(str(p))[0][0]

    reader = WavReader(duration=3.0, speed_pertub=True)
    chunk = 48000
    for seed in range(6):
        random.seed(seed)
        got, speed_idx = reader(str(p))
        # replay the reference order with the same stream
        random.seed(seed)
        idx = random.randint(0, 2)
        assert idx == speed_idx
        sig = decoded
        if idx > 0:
            up, down = speed_ratio([1.0, 0.9, 1.1][idx])
            sig = resample_poly(sig, up, down).astype(np.float32)
        if len(sig) >= chunk:
            start = random.randint(0, len(sig) - chunk)
            ref = sig[start:start + chunk]
        else:
            ref = np.pad(sig, (0, chunk - len(sig)))
        np.testing.assert_allclose(got, ref, atol=TOL, rtol=0)


def test_short_utterance_pad_path(tmp_path):
    """speed 0.9/1.1 on an utterance shorter than the crop: pad branch."""
    import random

    from speaker3d_tpu.data.processors import WavReader
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(3)
    wav = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    p = tmp_path / "s.wav"
    write_wav(str(p), wav, 16000)
    reader = WavReader(duration=3.0, speed_pertub=True)
    for seed in range(8):
        random.seed(seed)
        got, speed_idx = reader(str(p))
        assert got.shape == (48000,)
        if speed_idx:
            up, down = speed_ratio([1.0, 0.9, 1.1][speed_idx])
            assert np.any(got[:out_len(16000, up, down)] != 0)
            assert not np.any(got[out_len(16000, up, down):] != 0)


def test_speed_ratio():
    assert speed_ratio(0.9) == (10, 9)
    assert speed_ratio(1.1) == (10, 11)
    up, down = speed_ratio(1.05)
    assert abs(up / down - 1 / 1.05) < 1e-3
