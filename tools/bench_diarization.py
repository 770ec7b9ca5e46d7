"""End-to-end diarization RTF benchmark on synthetic multi-speaker audio.

Measures the full pipeline (VAD + post-processing on host, chunking,
batched fbank+ERes2NetV2-w24s4ep4 embeddings on device, AHC clustering) on
an N-minute synthetic conversation, reporting audio-seconds/s and RTF —
the fork's .meta.json metric (reference: bin/infer_diarization.py:1045-1058).

Usage: python tools/bench_diarization.py [--minutes 10] [--small]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def synth_conversation(minutes: float, fs: int = 16000, seed: int = 0):
    rng = np.random.default_rng(seed)
    total = int(minutes * 60 * fs)
    wav = np.zeros(total, np.float32)
    freqs = [170, 230, 310]
    t = 0
    while t < total:
        spk = rng.integers(0, len(freqs))
        dur = int(rng.uniform(2.0, 8.0) * fs)
        end = min(t + dur, total)
        n = end - t
        f0 = freqs[spk] * (1 + 0.05 * rng.standard_normal())
        x = np.arange(n) / fs
        seg = (0.25 * np.sin(2 * np.pi * f0 * x)
               + 0.1 * np.sin(2 * np.pi * 2.3 * f0 * x)
               + 0.02 * rng.standard_normal(n))
        wav[t:end] = seg.astype(np.float32)
        t = end + int(rng.uniform(0.2, 1.0) * fs)  # pause
    # quantize to the PCM16 grid: real sources are PCM16 wavs, and this
    # lets the resident-wav upload take its production int16 wire path
    return (np.clip(np.rint(wav * 32768.0), -32768, 32767)
            .astype(np.float32) / 32768.0)


def main():
    import jax

    from speaker3d_tpu.diar.pipeline import DiarizationPipeline
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2, eres2netv2_w24s4ep4
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--small", action="store_true",
                   help="use the 17.8M config instead of w24s4ep4 (53.5M)")
    p.add_argument("--batch_size", type=int, default=128)
    args = p.parse_args()

    model = ERes2NetV2() if args.small else eres2netv2_w24s4ep4()
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    wav0 = np.zeros((1, 24000), np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    np.asarray(fbank(wav0)))
    import jax.numpy as jnp

    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    embed = build_embedding_fn(model, variables, precision=None,
                               dtype=jnp.bfloat16)
    pipe = DiarizationPipeline(embed, batch_size=args.batch_size)

    wav = synth_conversation(args.minutes)
    # warm the compiled batch executable
    pipe(wav[: 16000 * 30])

    audio_s = len(wav) / 16000
    for label in ("cold", "warm"):
        # cold includes one-time compiles at this chunk count (e.g. the
        # device AHC bucket executable); warm is the production steady state
        t0 = time.perf_counter()
        fields = pipe(wav)
        elapsed = time.perf_counter() - t0
        spk = len({f[2] for f in fields})
        stages = {k: round(v, 2) for k, v in pipe.last_stage_times.items()}
        host = stages.get("vad", 0) + stages.get("vad_post", 0)
        print(f"[{label}] diarized {audio_s:.0f}s audio in {elapsed:.2f}s "
              f"-> {audio_s/elapsed:.1f} audio-s/s "
              f"(RTF {elapsed/audio_s:.5f}), "
              f"{len(fields)} segments, {spk} speakers, "
              f"{len(pipe.last_chunks)} chunks, "
              f"stages {stages} (host VAD share "
              f"{100*host/elapsed:.0f}%), wire {pipe.last_wire}", flush=True)


if __name__ == "__main__":
    main()
