"""Profile the diarization host VAD chain function-by-function (r5 item 7).

With the embed stage device-resident, host VAD + post-processing is the
next ceiling (~49% of the 10-min warm wall, docs/BENCH.md). This breaks
the chain into its components on an N-minute synthetic conversation so
the optimization lands on the measured hot spot, not a guess.

CPU-only. Run: python tools/profile_vad.py [--minutes 90]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=90.0)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from speaker3d_tpu.diar import vad as vad_mod
    from tools.bench_diarization import synth_conversation

    wav = synth_conversation(args.minutes)
    fs = 16000
    vad = vad_mod.EnergyVAD(fs)
    hop = vad.hop_size

    def timed(fn, *a, **kw):
        best = float("inf")
        out = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            best = min(best, time.perf_counter() - t0)
        return out, best

    rows = {}
    (flags, wav_c), rows["energy_vad"] = timed(vad, wav)
    processed, rows["post_process_flags"] = timed(
        vad_mod.post_process_speech_flags, flags, 16.0, 200.0, 300.0)
    mask, rows["flags_to_mask"] = timed(
        vad_mod.flags_to_mask, processed, len(wav), hop)
    env, rows["frame_energy_envelope"] = timed(
        vad_mod.frame_energy_envelope, wav_c, fs)
    refined, rows["refine_boundaries"] = timed(
        vad_mod.refine_vad_boundaries_with_energy, wav_c, mask, fs,
        0.05, 10.0, 10.0)
    _iv, rows["mask_to_intervals"] = timed(
        vad_mod.mask_to_intervals, refined, fs)
    _raw, rows["flags_to_intervals"] = timed(
        vad_mod.flags_to_intervals, flags, len(wav_c), hop, fs)

    total = sum(rows.values())
    print(json.dumps({
        "minutes": args.minutes,
        "total_s": round(total, 3),
        "per_fn_s": {k: round(v, 3) for k, v in
                     sorted(rows.items(), key=lambda kv: -kv[1])},
        "intervals": len(_iv),
    }, indent=2))


if __name__ == "__main__":
    main()
