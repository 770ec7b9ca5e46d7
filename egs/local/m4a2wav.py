#!/usr/bin/env python3
"""VoxCeleb2 m4a -> wav conversion script generator + runner.

Behavioral contract (reference: egs/*/utils/m4a2wav.pl): walk
<m4a_root>/<dataset>/aac/<spkr>/<rec>/*.m4a, emit one ffmpeg command per
file into <wav_root>/<dataset>/m4a2wav_<dataset>.sh (pcm_s16le wav, same
relative layout), optionally executing them. Like the reference, requires
ffmpeg on PATH only when --run is given; generating the script needs
nothing.

Usage:
  python egs/local/m4a2wav.py <m4a_root> {dev,test} <wav_root> [--run [-j N]]
"""

from __future__ import annotations

import argparse
import os
import shlex
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor


def ffmpeg_argv(src: str, dst: str) -> list:
    """The conversion command the reference emits (m4a2wav.pl), as argv."""
    return ["ffmpeg", "-v", "8", "-i", src, "-f", "wav",
            "-acodec", "pcm_s16le", dst]


def ffmpeg_command(src: str, dst: str) -> str:
    """Shell-safe line for the generated script (paths quoted so
    whitespace in filenames survives)."""
    return " ".join(shlex.quote(a) for a in ffmpeg_argv(src, dst))


def collect(m4a_root: str, dataset: str, wav_root: str):
    """Yield (m4a_path, wav_path) pairs in the reference's aac/ layout."""
    base = os.path.join(m4a_root, dataset, "aac")
    if not os.path.isdir(base):
        raise SystemExit(f"Cannot open directory: {base}")
    for spkr in sorted(os.listdir(base)):
        spk_dir = os.path.join(base, spkr)
        if not os.path.isdir(spk_dir):
            continue
        for rec in sorted(os.listdir(spk_dir)):
            rec_dir = os.path.join(spk_dir, rec)
            if not os.path.isdir(rec_dir):
                continue
            for f in sorted(os.listdir(rec_dir)):
                if not f.endswith(".m4a"):
                    continue
                name = f[: -len(".m4a")]
                yield (os.path.join(rec_dir, f),
                       os.path.join(wav_root, dataset, "aac", spkr, rec,
                                    name + ".wav"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("m4a_root")
    p.add_argument("dataset", choices=["dev", "test"])
    p.add_argument("wav_root")
    p.add_argument("--run", action="store_true",
                   help="execute the conversions (requires ffmpeg) instead "
                        "of only writing the script, which is all the "
                        "reference script does by default")
    p.add_argument("-j", "--jobs", type=int, default=os.cpu_count() or 1)
    args = p.parse_args(argv)

    pairs = list(collect(args.m4a_root, args.dataset, args.wav_root))
    os.makedirs(os.path.join(args.wav_root, args.dataset), exist_ok=True)
    script = os.path.join(args.wav_root, args.dataset,
                          f"m4a2wav_{args.dataset}.sh")
    with open(script, "w") as f:
        for src, dst in pairs:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            f.write(ffmpeg_command(src, dst) + "\n")
    print(f"{len(pairs)} conversions -> {script}")

    if args.run:
        if shutil.which("ffmpeg") is None:
            raise SystemExit(
                "Error: this script requires that ffmpeg is installed.")

        def convert(pair):
            src, dst = pair
            return subprocess.run(ffmpeg_argv(src, dst),
                                  capture_output=True).returncode

        with ThreadPoolExecutor(max_workers=args.jobs) as ex:
            codes = list(ex.map(convert, pairs))
        bad = sum(1 for c in codes if c != 0)
        if bad:
            raise SystemExit(f"{bad}/{len(pairs)} conversions failed")
        print(f"converted {len(pairs)} files with {args.jobs} jobs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
