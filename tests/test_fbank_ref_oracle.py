"""Fbank parity vs an INDEPENDENT oracle: the reference toolkit's own C++
feature frontend (reference: runtime/onnxruntime/feature/feature_common.cpp:39-162,
feature_functions.cpp:37-61), compiled from /root/reference by
tools/build_ref_fbank_oracle.py and frozen into tests/data/golden_fbank_ref.npz
so this test runs without a compiler or the reference checkout.

This demotes the self-authored numpy oracle (tests/golden_fbank.py, still
exercised by tests/test_fbank.py) to a cross-check: all three in-repo
implementations (XLA folded-matmul, Pallas kernel, native C++ runtime) are
checked here against vectors produced by code not written in this repo.

Tolerances: both the oracle (radix-2 float32 FFT) and our frontends carry
float32 rounding whose LOG-domain magnitude scales with how far a mel bin
sits below the frame's spectral peak — near spectral nulls (>8 nats down,
i.e. >35 dB) the relative energy error of ANY float32 pipeline dominates.
So: strong bins (within 8 nats of the frame max) must agree to 5e-4;
null bins to 2e-2; and the mean |diff| must stay below 1e-3.
"""

import os
import subprocess

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_fbank_ref.npz")
NAMES = ["tone_440", "harmonics", "white_noise", "am_chirp", "quiet",
         "tone_noise"]


@pytest.fixture(scope="module")
def golden():
    assert os.path.isfile(GOLDEN), (
        "frozen oracle missing — regenerate with "
        "tools/build_ref_fbank_oracle.py")
    return np.load(GOLDEN)


def _assert_close(got, want, name):
    assert got.shape == want.shape, (name, got.shape, want.shape)
    diff = np.abs(got - want)
    strong = want > want.max(axis=1, keepdims=True) - 8.0
    assert diff[strong].max() < 5e-4, (name, "strong", diff[strong].max())
    assert diff.max() < 2e-2, (name, "all", diff.max())
    assert diff.mean() < 1e-3, (name, "mean", diff.mean())


def test_xla_fbank_matches_reference_cpp(golden):
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    fb = KaldiFbank(FbankConfig(sample_rate=16000, num_mel_bins=80),
                    mean_norm=False)
    for name in NAMES:
        wav = golden["wav_" + name].astype(np.float32) / 32767.0
        _assert_close(np.asarray(fb(wav[None]))[0],
                      golden["fbank_" + name], name)


def test_pallas_fbank_matches_reference_cpp(golden):
    from speaker3d_tpu.ops.pallas.fbank_kernel import pallas_fbank

    for name in ["tone_440", "white_noise"]:
        wav = golden["wav_" + name].astype(np.float32) / 32767.0
        got = np.asarray(pallas_fbank(wav[None], interpret=True))[0]
        _assert_close(got, golden["fbank_" + name], name)


def test_native_fbank_matches_reference_cpp(golden, tmp_path):
    """runtime/src/fbank.cpp (our from-scratch C++ frontend) vs the
    reference's C++ frontend, on identical int16 samples."""
    import wave

    build = "/root/repo/runtime/build"
    exe = os.path.join(build, "make_fbank_feature")
    if not os.path.isfile(exe):
        subprocess.run(["cmake", "-B", build, "-G", "Ninja", "."],
                       cwd="/root/repo/runtime", check=True,
                       capture_output=True)
        subprocess.run(["ninja", "-C", build], cwd="/root/repo/runtime",
                       check=True, capture_output=True)

    for name in ["harmonics", "am_chirp"]:
        pcm = golden["wav_" + name]
        wav_path = os.path.join(tmp_path, name + ".wav")
        with wave.open(wav_path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        out_path = os.path.join(tmp_path, name + ".txt")
        subprocess.run([exe, wav_path, out_path], check=True,
                       capture_output=True)
        got = np.loadtxt(out_path).astype(np.float32)
        want = golden["fbank_" + name]
        # our runtime decodes int16/32768 vs the oracle's /32767: a constant
        # 2*ln(32768/32767) ~ 6.1e-5 log offset, inside the tolerances
        _assert_close(got, want, name)
