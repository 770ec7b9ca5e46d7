"""Embedding extraction CLI.

Behavioral contract (reference: speakerlab/bin/extract.py + the batch
semantics of bin/infer_sv_batch.py:388-411): read an experiment dir (config +
checkpoint) or an explicit model spec, shard the wav.scp across processes,
extract one embedding per utterance, write .npz embedding archives.

Two modes:
  - ``chunked`` (default, static shapes — the TPU-fast path, mirroring
    infer_sv_batch): cap each wav at 90 s, split into 10 s chunks with the
    final chunk circle-padded, batch across chunks, average the chunk
    embeddings per utterance.
  - ``exact`` (reference extract.py semantics): embed each full variable-
    length utterance; one compile per distinct frame count (cached).

Usage:
  python -m speaker3d_tpu.cli.extract --exp_dir exp/foo --data wav.scp \
      --out_dir exp/foo/embeddings [--mode chunked]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from speaker3d_tpu.diar.pipeline import circle_pad
from speaker3d_tpu.eval.scoring import save_embeddings
from speaker3d_tpu.utils.fileio import load_audio, load_wav_scp
from speaker3d_tpu.utils.wire import wire_quantize

CHUNK_SECONDS = 10.0
MAX_SECONDS = 90.0


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Extract speaker embeddings")
    p.add_argument("--exp_dir", default=None, help="experiment dir with config + ckpt")
    p.add_argument("--model_id", default=None, help="pretrained model id (registry)")
    p.add_argument("--data", required=True, help="wav.scp")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--mode", choices=["chunked", "exact"], default="chunked")
    p.add_argument("--out_type", choices=["npz", "ark"], default="npz",
                   help="'ark' writes Kaldi binary ark + scp like the "
                        "reference's kaldiio WriteHelper (reference: "
                        "bin/extract.py:79); native writer, no kaldiio")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--buckets", default=None,
                   help="chunked mode: comma-separated duration buckets in "
                        "seconds (e.g. '1.5,3,6,10'; last = chunk size). "
                        "The final partial chunk circle-pads to its "
                        "smallest holding bucket instead of the full "
                        "chunk — faster on short-utterance corpora; "
                        "default keeps the reference's pad-to-chunk "
                        "semantics")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--nprocs", type=int, default=1,
                   help="local subprocess fan-out (utils/fanout.py); files\n"
                        "shard rank::nprocs. CPU/multi-device hosts only")
    return p.parse_args(argv)


def build_model_from_exp(exp_dir: str):
    """Rebuild model + variables from an experiment dir (cli.train layout)."""
    import jax

    from speaker3d_tpu.utils.builder import dynamic_import
    from speaker3d_tpu.utils.checkpoint import Checkpointer
    from speaker3d_tpu.utils.config import build_config

    config = build_config(os.path.join(exp_dir, "config.yaml"))
    model_cls = dynamic_import(config["model"]["obj"])
    model = model_cls(**config["model"].get("args", {}))
    ckpt = Checkpointer(os.path.join(exp_dir, "models"))
    states = ckpt.recover_if_possible()
    if states is None or "train_state" not in states:
        raise FileNotFoundError(f"no checkpoint under {exp_dir}/models")
    ts = states["train_state"]
    variables = {"params": ts["params"], "batch_stats": ts["batch_stats"]}
    return model, variables, config


def extract_embeddings(embed_fn, wav_scp, *, mode="chunked", batch_size=64,
                       sample_rate=16000, feature_fn=None, model=None,
                       variables=None, bucket_seconds=None):
    """Return {utt: emb}. ``embed_fn``: [B, L] -> [B, D] (chunked mode).

    ``bucket_seconds`` (chunked mode): duration buckets, ascending; the
    last is the chunk size. The final partial chunk circle-pads to the
    SMALLEST bucket that holds it instead of the full chunk — K compiled
    shapes instead of one, big wins on short-utterance corpora (a 4 s wav
    embeds 4.8 s of samples instead of 10 s). Same plan as the native AOT
    engine (eval/chunking.py / runtime chunk_plan.h)."""
    out = {}
    if mode == "chunked":
        from speaker3d_tpu.eval.chunking import plan_chunks

        max_len = int(MAX_SECONDS * sample_rate)
        buckets = sorted(int(b * sample_rate)
                         for b in (bucket_seconds or [CHUNK_SECONDS]))
        bufs = {b: [] for b in buckets}  # per compiled length
        # Double-buffered dispatch: the device result of batch k is fetched
        # only AFTER batch k+1 is dispatched, so host decode/pack and the
        # O(100 ms) tunnel dispatch latency overlap device compute (jax
        # dispatch is async; np.asarray is the synchronization point).
        in_flight = []  # [(entries, device_result)]

        def drain(limit):
            while len(in_flight) > limit:
                entries, dev = in_flight.pop(0)
                embs = np.asarray(dev)[: len(entries)]
                for (utt, _), e in zip(entries, embs):
                    out.setdefault(utt, []).append(e)

        def flush(blen):
            buf = bufs[blen]
            if not buf:
                return
            wavs = np.stack([b[1] for b in buf])
            n = wavs.shape[0]
            if n < batch_size:
                wavs = np.concatenate(
                    [wavs, np.zeros((batch_size - n, blen), np.float32)])
            # PCM16 wire (r5): when every sample in the batch is exactly
            # k/32768 the device reconstruction is bitwise identical and
            # the upload halves (utils/wire.py; embed_fn converts in-jit).
            # Mixed/augmented batches fall back to float32 automatically.
            q = wire_quantize(wavs)
            in_flight.append((list(buf), embed_fn(q if q is not None
                                                  else wavs)))
            buf.clear()
            # 4-deep async dispatch (like diar/pipeline.py): per-dispatch
            # tunnel latency and batch uploads overlap device compute
            drain(limit=3)

        for utt, path in wav_scp.items():
            wav = load_audio(path, obj_fs=sample_rate)[0]
            if wav.shape[0] == 0:
                continue
            # 10s chunks / 90s cap; final partial chunk circle-padded
            # (reference: bin/infer_sv_batch.py:402-411; with buckets, to
            # its smallest holding bucket)
            for c in plan_chunks(wav.shape[0], buckets, max_len):
                piece = wav[c.start:c.start + c.length]
                bufs[c.padded].append((utt, circle_pad(piece, c.padded)))
                if len(bufs[c.padded]) == batch_size:
                    flush(c.padded)
        for blen in buckets:
            flush(blen)
        drain(limit=0)
        return {utt: np.mean(np.stack(es), axis=0) for utt, es in out.items()}

    # exact mode: full-utterance embedding, compile per distinct length
    import jax

    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    fbank = feature_fn or KaldiFbank(
        FbankConfig(sample_rate=sample_rate), mean_norm=True)

    @jax.jit
    def embed_full(wav):
        feats = fbank(wav[None])
        with jax.default_matmul_precision("highest"):
            return model.apply(variables, feats)[0]

    for utt, path in wav_scp.items():
        wav = load_audio(path, obj_fs=sample_rate)[0]
        out[utt] = np.asarray(embed_full(wav))
    return out


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.parallel.mesh import process_rank, process_shard

    args = get_args(argv)
    from speaker3d_tpu.utils.fanout import maybe_fanout

    if maybe_fanout("speaker3d_tpu.cli.extract", argv, args.nprocs):
        return
    if args.exp_dir:
        model, variables, _ = build_model_from_exp(args.exp_dir)
    elif args.model_id:
        from speaker3d_tpu.cli.registry import load_pretrained

        model, variables = load_pretrained(args.model_id)
    else:
        raise SystemExit("one of --exp_dir / --model_id is required")

    wav_scp = load_wav_scp(args.data)
    keys = process_shard(sorted(wav_scp))
    shard_scp = {k: wav_scp[k] for k in keys}

    embed_fn = build_embedding_fn(model, variables, precision="highest",
                                  sample_rate=args.sample_rate)
    buckets = ([float(s) for s in args.buckets.split(",")]
               if args.buckets else None)
    embs = extract_embeddings(embed_fn, shard_scp, mode=args.mode,
                              batch_size=args.batch_size,
                              sample_rate=args.sample_rate,
                              model=model, variables=variables,
                              bucket_seconds=buckets)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.out_type == "ark":
        from speaker3d_tpu.utils.kaldi_ark import write_ark_scp

        base = os.path.join(args.out_dir, f"embedding_{process_rank()}")
        write_ark_scp(base + ".ark", embs, base + ".scp")
    else:
        save_embeddings(os.path.join(
            args.out_dir, f"embeddings_{process_rank()}.npz"), embs)
    print(f"wrote {len(embs)} embeddings to {args.out_dir}")


if __name__ == "__main__":
    main()
