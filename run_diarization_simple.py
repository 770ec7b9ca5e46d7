#!/usr/bin/env python3
"""Batch diarization driver over a directory (no overlap detection).

Behavioral contract (reference: run_diarization_simple.py — the fork's
top-level driver wrapping infer_diarization): scan a directory for audio
files, run VAD + embeddings + AHC clustering on each, write per-file RTTM/
JSON + diagnostic sidecars.

Usage:
  python run_diarization_simple.py --src_dir wavs/ --out_dir out/ \
      [--speaker_num N] [--out_type rttm|json] [--model_id ID]
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--speaker_num", type=int, default=None)
    p.add_argument("--out_type", choices=["rttm", "json"], default="json")
    p.add_argument("--model_id",
                   default="iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common")
    p.add_argument("--exp_dir", default=None)
    args, extra = p.parse_known_args()

    from speaker3d_tpu.cli.infer_diarization import main as diar_main

    argv = ["--wav", args.src_dir, "--out_dir", args.out_dir,
            "--out_type", args.out_type, "--sidecar"] + extra
    if args.speaker_num is not None:
        argv += ["--speaker_num", str(args.speaker_num)]
    if args.exp_dir:
        argv += ["--exp_dir", args.exp_dir]
    else:
        argv += ["--model_id", args.model_id]
    diar_main(argv)


if __name__ == "__main__":
    sys.exit(main())
