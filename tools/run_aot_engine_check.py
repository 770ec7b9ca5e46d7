"""End-to-end check of the standalone C++ PJRT serving engine on the TPU.

Exports a model's AOT artifact (raw StableHLO), writes a test wav, runs the
native `extract_speaker_embedding --engine aot` binary against the axon
PJRT plugin (PYTHONHOME/PYTHONPATH-free child: no CPython anywhere in the
serving path), and parity-checks the embedding against the in-process
Python/XLA pipeline (VERDICT r1 item 5).

TPU etiquette (CLAUDE.md): run alone — never concurrently with another
TPU process. From the repo root:
    python tools/run_aot_engine_check.py [--model tiny|flagship]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import uuid

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The PYTHON side (export + reference embedding) runs on CPU so the TPU is
# only ever touched by ONE process — the C++ engine under test. Without
# this the parent would hold a tunnel client while the child creates a
# second one (never run two TPU processes concurrently — CLAUDE.md).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_model(kind: str):
    from speaker3d_tpu.models.eres2netv2 import (
        ERes2NetV2,
        eres2netv2_w24s4ep4,
    )

    if kind == "tiny":
        return ERes2NetV2(num_blocks=(1, 1, 1, 1), m_channels=8,
                          feat_dim=80, embedding_size=32)
    if kind == "w24s4ep4":
        return eres2netv2_w24s4ep4()
    return ERes2NetV2(feat_dim=80, embedding_size=192)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny",
                   choices=["tiny", "flagship", "w24s4ep4"])
    p.add_argument("--workdir", default="/tmp/aot_engine_check")
    p.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    p.add_argument("--frames", type=int, default=298)
    p.add_argument("--buckets", default=None,
                   help="comma-separated bucket seconds (e.g. '1.5,3,6,10')"
                        ": exports a bucketed artifact and checks MIXED-"
                        "length wavs through the native chunk/circle-pad/"
                        "mean path against the Python plan (VERDICT r2 "
                        "item 3). One executable compile per bucket.")
    args = p.parse_args()

    import jax

    from speaker3d_tpu.cli.export_speaker_embedding import export_aot_artifact
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.utils.fileio import read_wav, write_wav

    os.makedirs(args.workdir, exist_ok=True)
    model = build_model(args.model)
    rng = np.random.default_rng(0)
    feats0 = rng.standard_normal((1, args.frames, 80)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)

    buckets = ([float(s) for s in args.buckets.split(",")]
               if args.buckets else None)
    aot_dir = os.path.join(args.workdir, "aot")
    meta = export_aot_artifact(model, variables, aot_dir, feat_dim=80,
                               frames=args.frames, bucket_seconds=buckets)
    print("AOT artifact:", meta)

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    fwd = jax.jit(lambda f: model.apply(variables, f))

    def synth(seconds, f0):
        n = int(seconds * 16000)
        return (0.3 * np.sin(2 * np.pi * f0 * np.arange(n) / 16000)
                + 0.01 * rng.standard_normal(n)).astype(np.float32)

    # test wavs + wav.scp: mixed lengths in bucket mode (short, exactly one
    # chunk, chunk+partial, many chunks), single 3 s wav otherwise
    durations = ([(2.0, 300.0), (3.0, 440.0), (14.5, 650.0), (31.0, 220.0)]
                 if buckets else [(3.0, 440.0)])
    scp = os.path.join(args.workdir, "wav.scp")
    wants = {}
    with open(scp, "w") as f:
        for i, (sec, f0) in enumerate(durations):
            utt = f"test{i}"
            wav_path = os.path.join(args.workdir, f"{utt}.wav")
            write_wav(wav_path, synth(sec, f0), 16000)
            f.write(f"{utt} {wav_path}\n")

            decoded, _ = read_wav(wav_path)
            if buckets:
                # python-side reference: the SAME chunk plan the native
                # CLI executes (plan mirror is lockstep-tested)
                from speaker3d_tpu.eval.chunking import (
                    embed_mean_over_plan,
                    plan_chunks,
                )

                plan = plan_chunks(
                    decoded.shape[1],
                    [b["samples"] for b in meta["buckets"]],
                    int(meta["max_seconds"] * 16000))
                wants[utt] = embed_mean_over_plan(
                    lambda w: fwd(np.asarray(fbank(w))), decoded[0], plan)
            else:
                # pad/trim to `frames` by repeating the last frame (the
                # engine's single-shape padding rule)
                fb = np.asarray(fbank(decoded[0]))
                if fb.shape[0] >= args.frames:
                    fb = fb[: args.frames]
                else:
                    fb = np.concatenate(
                        [fb,
                         np.repeat(fb[-1:], args.frames - fb.shape[0],
                                   axis=0)])
                wants[utt] = np.asarray(fwd(fb[None]))[0]

    # run the native binary: child env has NO python configuration, only
    # the axon relay knobs the sitecustomize would have set
    exe = os.path.join(REPO, "runtime", "build",
                       "extract_speaker_embedding")
    out_dir = os.path.join(args.workdir, "emb")
    os.makedirs(out_dir, exist_ok=True)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PYTHON", "JAX"))}
    env.update({
        "AXON_POOL_SVC_OVERRIDE": "127.0.0.1",
        "AXON_LOOPBACK_RELAY": "1",
        "TPU_WORKER_HOSTNAMES": "localhost",
        "AXON_COMPAT_VERSION": os.environ.get("AXON_COMPAT_VERSION", "49"),
        "SPEAKER3D_PJRT_OPTIONS": ",".join([
            f"topology={os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
            "n_slices=1",
            f"session_id={uuid.uuid4()}",
            "rank=4294967295",
            "remote_compile="
            + ("1" if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
               else "0"),
            "local_only=0",
            "priority=0",
        ]),
    })
    cmd = [exe, scp, out_dir, aot_dir, "--engine", "aot",
           "--plugin", args.plugin]
    print("running:", " ".join(cmd))
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1800)
    print(r.stderr[-2000:])
    if r.returncode != 0:
        print("FAILED rc", r.returncode)
        return 1

    min_cos = 1.0
    for utt, want in wants.items():
        got = np.loadtxt(os.path.join(out_dir, f"{utt}.emb"),
                         dtype=np.float32)
        cos = float(np.dot(got, want)
                    / (np.linalg.norm(got) * np.linalg.norm(want)))
        min_cos = min(min_cos, cos)
        print(json.dumps({"metric": "aot_engine_cosine_vs_python",
                          "utt": utt, "value": round(cos, 6),
                          "model": args.model,
                          "buckets": bool(buckets),
                          "max_abs_diff": float(np.abs(got - want).max())}))
    return 0 if min_cos > 0.999 else 1


if __name__ == "__main__":
    sys.exit(main())
