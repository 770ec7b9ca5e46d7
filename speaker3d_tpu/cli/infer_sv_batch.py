"""Large-scale batch SV embedding extraction CLI.

Behavioral contract (reference: speakerlab/bin/infer_sv_batch.py): wav list
in, per-wav embedding out (.npy per wav or one .npz archive); each wav capped
at 90 s and split into 10 s circle-padded chunks whose embeddings are
averaged (:388-411); decode failures are logged and skipped (:361-365);
work shards across hosts.

Usage:
  python -m speaker3d_tpu.cli.infer_sv_batch --model_id ID \
      --wavs list.txt --out_dir embs [--out_type npy|npz]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Batch speaker embedding extraction")
    p.add_argument("--model_id",
                   default="iic/speech_eres2netv2_sv_zh-cn_16k-common")
    p.add_argument("--local_model_dir", default="pretrained")
    p.add_argument("--exp_dir", default=None)
    p.add_argument("--wavs", required=True,
                   help="wav path, dir, or list file (one path per line)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--out_type", choices=["npy", "npz", "ark"],
                   default="npy",
                   help="'ark' = Kaldi binary ark+scp (the reference's "
                        "--feat_out_format ark, bin/infer_sv_batch.py:42)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--buckets", default=None,
                   help="comma-separated duration buckets in seconds "
                        "(e.g. '1.5,3,6,10'; last = chunk size); the final "
                        "partial chunk circle-pads to its smallest holding "
                        "bucket (see cli/extract --buckets)")
    p.add_argument("--nprocs", type=int, default=1,
                   help="local subprocess fan-out (utils/fanout.py); files\n"
                        "shard rank::nprocs. CPU/multi-device hosts only")
    return p.parse_args(argv)


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.cli.extract import extract_embeddings
    from speaker3d_tpu.cli.infer_diarization import collect_wavs
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.parallel.mesh import process_rank, process_shard

    args = get_args(argv)
    from speaker3d_tpu.utils.fanout import maybe_fanout

    if maybe_fanout("speaker3d_tpu.cli.infer_sv_batch", argv, args.nprocs):
        return
    if args.exp_dir:
        from speaker3d_tpu.cli.extract import build_model_from_exp

        model, variables, _ = build_model_from_exp(args.exp_dir)
    else:
        from speaker3d_tpu.cli.registry import load_pretrained

        model, variables = load_pretrained(args.model_id, args.local_model_dir)

    wav_paths = process_shard(collect_wavs([args.wavs]))
    scp = {}
    for p in wav_paths:
        utt = os.path.splitext(os.path.basename(p))[0]
        scp[utt] = p

    embed_fn = build_embedding_fn(model, variables, precision="high")

    # decode failures: log + skip (reference: infer_sv_batch.py:361-365)
    good_scp = {}
    for utt, path in scp.items():
        try:
            with open(path, "rb") as f:
                f.read(4)
            good_scp[utt] = path
        except OSError as e:
            print(f"[WARNING] skipping {path}: {e}")

    buckets = ([float(s) for s in args.buckets.split(",")]
               if args.buckets else None)
    embs = extract_embeddings(embed_fn, good_scp, mode="chunked",
                              batch_size=args.batch_size,
                              bucket_seconds=buckets)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.out_type == "ark":
        from speaker3d_tpu.utils.kaldi_ark import write_ark_scp

        base = os.path.join(args.out_dir, f"embedding_{process_rank()}")
        write_ark_scp(base + ".ark", embs, base + ".scp")
    elif args.out_type == "npy":
        for utt, emb in embs.items():
            np.save(os.path.join(args.out_dir, f"{utt}.npy"), emb)
    else:
        from speaker3d_tpu.eval.scoring import save_embeddings

        save_embeddings(os.path.join(
            args.out_dir, f"embeddings_{process_rank()}.npz"), embs)
    print(f"extracted {len(embs)} embeddings -> {args.out_dir}")


if __name__ == "__main__":
    main()
