"""Profile the host data loader in isolation (no jax, CPU only).

Reproduces the soak corpus (tools/soak_train.py) and measures the
production BatchLoader's batches/s at B=128, plus a per-component
breakdown (read_wav / speed_perturb / crop+pad / stack) so the
data_wait_s share seen in training has named causes.

Usage: PYTHONPATH=/root/repo python tools/profile_loader.py [workdir]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FS = 16000


def build_corpus(root, n_spk=64, utt_per_spk=4, rows=2560, utt_s=4.0):
    from speaker3d_tpu.utils.fileio import write_wav

    wav_dir = os.path.join(root, "corpus")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = {}
    for s in range(n_spk):
        f0 = 90.0 * (1.22 ** (s % 16))
        for u in range(utt_per_spk):
            p = os.path.join(wav_dir, f"s{s}_u{u}.wav")
            if not os.path.exists(p):
                n = int(utt_s * FS)
                t = np.arange(n) / FS
                sig = np.sin(2 * np.pi * f0 * t)
                write_wav(p, (0.3 * sig + 0.004
                              * rng.standard_normal(n)).astype(np.float32),
                          FS)
            paths.setdefault(s, []).append(p)
    csv = os.path.join(root, "train.csv")
    with open(csv, "w") as f:
        f.write("ID,wav,spk\n")
        for i in range(rows):
            s = i % n_spk
            u = (i // n_spk) % utt_per_spk
            f.write(f"row{i},{paths[s][u]},spk{s}\n")
    return csv


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="loaderprof_")
    csv = build_corpus(root)
    from speaker3d_tpu.data.dataset import BatchLoader, WavSVDataset
    from speaker3d_tpu.data.processors import SpkLabelEncoder, WavReader

    B = 128
    reader = WavReader(duration=3.0, speed_pertub=True)
    enc = SpkLabelEncoder(csv)
    ds = WavSVDataset(csv, reader, enc)

    # --- end-to-end loader rate (the number train.py sees) ---
    for workers in (1, 2, 4, 8):
        loader = BatchLoader(ds, batch_size=B, num_workers=workers, seed=0)
        it = iter(loader)
        next(it)  # warm
        t0 = time.time()
        n = 0
        for _ in range(10):
            next(it)
            n += 1
        dt = time.time() - t0
        print(f"workers={workers}: {n/dt:.2f} batches/s "
              f"= {n*B*3.0/dt:.0f} audio-s/s")
        del it, loader

    # --- single-thread per-sample component breakdown ---
    import random
    random.seed(0)
    prof = cProfile.Profile()
    prof.enable()
    for i in range(256):
        ds[i % len(ds)]
    prof.disable()
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
