"""Single/pair speaker-verification inference CLI.

Behavioral contract (reference: speakerlab/bin/infer_sv.py:213-317): resolve
a pretrained model id, per wav: load -> 16k mono -> fbank(mean_nor) -> model
-> save .npy embedding; with exactly two wavs also print the cosine
similarity verdict.

Usage:
  python -m speaker3d_tpu.cli.infer_sv \
      --model_id iic/speech_eres2netv2_sv_zh-cn_16k-common \
      --wavs a.wav b.wav [--local_model_dir pretrained] [--save_dir embs]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Extract speaker embeddings.")
    p.add_argument("--model_id", required=True)
    p.add_argument("--wavs", nargs="+", required=True)
    p.add_argument("--local_model_dir", default="pretrained")
    p.add_argument("--save_dir", default=None)
    p.add_argument("--yes_or_no_threshold", type=float, default=0.5)
    return p.parse_args(argv)


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.cli.registry import load_pretrained
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.utils.fileio import load_audio

    args = get_args(argv)
    model, variables = load_pretrained(args.model_id, args.local_model_dir)
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)

    @jax.jit
    def embed(wav):
        feats = fbank(wav[None])
        with jax.default_matmul_precision("highest"):
            return model.apply(variables, feats)[0]

    wav_paths = list(args.wavs)
    if (len(wav_paths) == 1
            and not wav_paths[0].lower().endswith((".wav", ".flac"))):
        # single non-audio arg = file listing one wav path per line
        # (reference: bin/infer_sv.py:318-331)
        try:
            with open(wav_paths[0]) as f:
                wav_paths = [ln.strip() for ln in f if ln.strip()]
        except (UnicodeDecodeError, OSError) as e:
            raise SystemExit(
                "[ERROR]: Input should be a wav file or a wav list "
                f"(could not read {wav_paths[0]!r} as a list: {e})")
        print(f"[INFO] wav list with {len(wav_paths)} entries")

    embs = []
    for wav_path in wav_paths:
        wav = load_audio(wav_path, obj_fs=16000)[0]
        emb = np.asarray(embed(wav))
        embs.append(emb)
        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(wav_path))[0]
            np.save(os.path.join(args.save_dir, f"{base}.npy"), emb)
            print(f"[INFO] embedding of {wav_path} saved")

    if len(embs) == 2:
        a, b = embs
        score = float(np.dot(a, b) /
                      (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        verdict = "yes" if score >= args.yes_or_no_threshold else "no"
        print(f"[INFO] cosine similarity: {score:.5f}")
        print(f"[INFO] same speaker: {verdict}")


if __name__ == "__main__":
    main()
