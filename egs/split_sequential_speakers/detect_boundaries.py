#!/usr/bin/env python3
"""Detect sequential-speaker boundaries from extracted embeddings.

Behavioral contract (reference: egs/split_sequential_speakers/
detect_boundaries_from_embeddings.py): given per-utterance embeddings of a
recording session known to contain N speakers speaking SEQUENTIALLY (e.g.
interview turns recorded as numbered utterances), place the N-1 boundaries:
start from equal theoretical split points and refine each locally by
cosine-to-segment-center or GMM separation score (speaker3d_tpu.diar.
boundaries). Embeddings are ordered by sorted utterance key.

Usage:
  python detect_boundaries.py --emb exp/embeddings --num_speakers 2 \
      [--method cosine|gmm] [--boundary_window 10] [--out boundaries.json]
"""

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--emb", required=True,
                   help="embeddings dir (npy per utt or kaldi-style ark)")
    p.add_argument("--num_speakers", type=int, required=True)
    p.add_argument("--method", choices=["cosine", "gmm"], default="cosine")
    p.add_argument("--boundary_window", type=int, default=10)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from speaker3d_tpu.diar.boundaries import detect_speaker_boundaries
    from speaker3d_tpu.eval.scoring import load_embeddings

    embs = load_embeddings(args.emb)
    if not embs:
        raise FileNotFoundError(f"no embeddings under {args.emb}")
    keys = sorted(embs)
    mat = np.stack([np.asarray(embs[k]).reshape(-1) for k in keys])
    boundaries = detect_speaker_boundaries(
        mat, args.num_speakers, method=args.method,
        boundary_window=args.boundary_window)

    edges = [0] + boundaries + [len(keys)]
    segments = [{"speaker": i, "first_utt": keys[a], "last_utt": keys[b - 1],
                 "num_utts": b - a}
                for i, (a, b) in enumerate(zip(edges[:-1], edges[1:]))]
    result = {"num_utts": len(keys), "num_speakers": args.num_speakers,
              "method": args.method, "boundaries": boundaries,
              "segments": segments}
    text = json.dumps(result, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"boundaries -> {args.out}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
