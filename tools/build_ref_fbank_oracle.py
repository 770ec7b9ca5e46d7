"""Regenerate the independent fbank golden vectors (tests/data/golden_fbank_ref.npz).

Compiles the REFERENCE toolkit's own C++ feature frontend
(/root/reference/runtime/onnxruntime/feature/*.cpp — an oracle not authored
in this repo) into a dumper binary, runs it on synthetic wavs, and freezes
the resulting log-fbank matrices into tests/data/ so the oracle test keeps
working without a compiler or the reference checkout (VERDICT r1 item 2).

Run from the repo root: python tools/build_ref_fbank_oracle.py
"""

import os
import struct
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/runtime/onnxruntime"
OUT_NPZ = os.path.join(REPO, "tests", "data", "golden_fbank_ref.npz")
FS = 16000


def find_nlohmann_include():
    cands = [
        "/usr/include",
        "/opt/venv/lib/python3.12/site-packages/tensorflow/include/external/"
        "cudnn_frontend_archive/include/cudnn_frontend/thirdparty",
    ]
    for c in cands:
        if os.path.isfile(os.path.join(c, "nlohmann", "json.hpp")):
            return c
    raise FileNotFoundError("nlohmann/json.hpp not found")


def build_dumper(build_dir):
    os.makedirs(build_dir, exist_ok=True)
    exe = os.path.join(build_dir, "ref_fbank_dump")
    srcs = [
        os.path.join(REPO, "tools", "ref_oracle", "main.cpp"),
        f"{REF}/feature/feature_basic.cpp",
        f"{REF}/feature/feature_common.cpp",
        f"{REF}/feature/feature_fbank.cpp",
        f"{REF}/feature/feature_functions.cpp",
        f"{REF}/utils/wav_reader.cpp",
    ]
    cmd = ["g++", "-O2", "-std=c++17", f"-I{REF}",
           f"-I{find_nlohmann_include()}", "-o", exe] + srcs
    subprocess.run(cmd, check=True)
    return exe


def synthetic_wavs():
    """Deterministic int16 test signals covering tones, noise, AM chirps,
    near-silence, and odd lengths."""
    rng = np.random.default_rng(20260820)
    out = {}

    def add(name, x):
        x = np.clip(x, -1.0, 1.0)
        out[name] = (x * 32767.0).astype(np.int16)

    t1 = np.arange(int(1.0 * FS)) / FS
    add("tone_440", 0.5 * np.sin(2 * np.pi * 440 * t1))
    add("harmonics", 0.3 * np.sin(2 * np.pi * 220 * t1)
        + 0.2 * np.sin(2 * np.pi * 660 * t1)
        + 0.1 * np.sin(2 * np.pi * 1980 * t1))
    add("white_noise", 0.3 * rng.standard_normal(int(0.73 * FS)))
    t2 = np.arange(int(2.3 * FS)) / FS
    chirp = np.sin(2 * np.pi * (200 + 1500 * t2 / t2[-1]) * t2)
    am = 0.5 * (1 + np.sin(2 * np.pi * 3 * t2))
    add("am_chirp", 0.4 * am * chirp)
    add("quiet", 0.003 * rng.standard_normal(int(0.5 * FS)))
    mix = (0.25 * np.sin(2 * np.pi * 123 * t1)
           + 0.15 * rng.standard_normal(t1.shape[0]))
    add("tone_noise", mix)
    return out


def write_wav_int16(path, data):
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(FS)
        w.writeframes(data.tobytes())


def read_dump(path):
    with open(path, "rb") as f:
        n, d = struct.unpack("<ii", f.read(8))
        mat = np.frombuffer(f.read(4 * n * d), np.float32).reshape(n, d)
    return mat


def main():
    build_dir = os.path.join(REPO, ".ref_oracle")
    exe = build_dumper(build_dir)
    arrays = {}
    for name, pcm in synthetic_wavs().items():
        wav_path = os.path.join(build_dir, name + ".wav")
        bin_path = os.path.join(build_dir, name + ".bin")
        write_wav_int16(wav_path, pcm)
        subprocess.run([exe, wav_path, bin_path], check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        arrays["fbank_" + name] = read_dump(bin_path)
        arrays["wav_" + name] = pcm
        print(f"{name}: {arrays['fbank_' + name].shape}")
    os.makedirs(os.path.dirname(OUT_NPZ), exist_ok=True)
    np.savez_compressed(OUT_NPZ, **arrays)
    print("wrote", OUT_NPZ)


if __name__ == "__main__":
    sys.exit(main())
