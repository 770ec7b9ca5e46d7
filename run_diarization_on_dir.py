#!/usr/bin/env python3
"""Pattern-matched batch diarization with an aggregated summary.

Behavioral contract (reference: run_diarization_on_dir.py): scan --src_dir
for files matching --pattern, diarize each (full VAD/cluster knob surface),
write per-file JSON plus an aggregated summary JSON {file -> num_speakers,
segments}.

Usage:
  python run_diarization_on_dir.py --src_dir d/ --pattern '*.wav' \
      --out_dir out/ --summary_out summary.json [diarization knobs...]
"""

import argparse
import glob
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", required=True)
    p.add_argument("--pattern", default="*speech_estimate.wav")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--summary_out", default=None)
    p.add_argument("--speaker_num", type=int, default=None)
    p.add_argument("--model_id",
                   default="iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common")
    p.add_argument("--exp_dir", default=None)
    p.add_argument("--per_sentence_reindex", action="store_true")
    args, extra = p.parse_known_args()

    wavs = sorted(glob.glob(os.path.join(args.src_dir, args.pattern)))
    if not wavs:
        print(f"no files matching {args.pattern} under {args.src_dir}")
        return 1
    out_dir = args.out_dir or os.path.join(args.src_dir, "diarization")
    os.makedirs(out_dir, exist_ok=True)

    from speaker3d_tpu.cli.infer_diarization import main as diar_main

    argv = ["--wav"] + wavs + ["--out_dir", out_dir, "--out_type", "json",
                               "--sidecar"] + extra
    if args.speaker_num is not None:
        argv += ["--speaker_num", str(args.speaker_num)]
    if args.exp_dir:
        argv += ["--exp_dir", args.exp_dir]
    else:
        argv += ["--model_id", args.model_id]
    diar_main(argv)

    summary = {}
    for wav in wavs:
        base = os.path.splitext(os.path.basename(wav))[0]
        jpath = os.path.join(out_dir, f"{base}.json")
        if not os.path.isfile(jpath):
            continue
        with open(jpath) as f:
            segs = json.load(f)
        spks = sorted({v["speaker"] for v in segs.values()})
        remap = ({s: i for i, s in enumerate(spks)}
                 if args.per_sentence_reindex else None)
        summary[base] = {
            "num_speakers": len(spks),
            "segments": [
                {"start": v["start"], "stop": v["stop"],
                 "speaker": remap[v["speaker"]] if remap else v["speaker"]}
                for v in segs.values()],
        }
    if args.summary_out:
        with open(args.summary_out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"summary for {len(summary)} files -> {args.summary_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
