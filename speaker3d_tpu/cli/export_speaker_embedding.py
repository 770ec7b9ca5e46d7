"""Serialized-model export CLI — the TPU-era analogue of ONNX export.

Behavioral contract (reference: speakerlab/bin/
export_speaker_embedding_onnx.py): take a registry model id or experiment
dir, export the feature->embedding function as a portable serialized
artifact with a dynamic batch axis (input 'feature' [B, T, 80] -> output
'embedding' [B, D]); verify the exported artifact against the source model
before writing.

Here the artifact is a jax.export StableHLO serialization (.stablehlo):
loadable by jax.export.deserialize in any process (including the native
runtime bridge) and compilable ahead-of-time for CPU or TPU. Dynamic axes
use shape polymorphism where the architecture allows it, else a fixed-shape
set is exported.

Usage:
  python -m speaker3d_tpu.cli.export_speaker_embedding \
      --exp_dir exp/foo --out model.stablehlo [--frames 300]
"""

from __future__ import annotations

import argparse

import numpy as np


def export_model(model, variables, *, feat_dim=80, frames=300,
                 try_polymorphic=True, precision="high"):
    """Returns (serialized_bytes, meta dict)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def fn(feature):
        with jax.default_matmul_precision(precision):
            return model.apply(variables, feature)

    jfn = jax.jit(fn)
    meta = {"feat_dim": feat_dim}
    if try_polymorphic:
        try:
            b, = jexport.symbolic_shape("b")
            exp = jexport.export(jfn)(
                jax.ShapeDtypeStruct((b, frames, feat_dim), jnp.float32))
            meta.update(dynamic_batch=True, frames=frames)
            return exp.serialize(), meta
        except Exception as e:  # fall back to static shapes
            meta["poly_error"] = str(e)[:200]
    exp = jexport.export(jfn)(
        jax.ShapeDtypeStruct((1, frames, feat_dim), jnp.float32))
    meta.update(dynamic_batch=False, frames=frames)
    return exp.serialize(), meta


def load_exported(path):
    """Deserialize an exported model -> callable(feature)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def frames_for_samples(samples: int, *, frame_length=400, frame_shift=160):
    """Kaldi snip_edges frame count for a waveform length."""
    return max(1 + (samples - frame_length) // frame_shift, 1)


def export_aot_artifact(model, variables, out_dir, *, feat_dim=80,
                        frames=300, batch=1, precision="high",
                        bucket_seconds=None, sample_rate=16000):
    """Write the RAW StableHLO bytecode + meta for the standalone native
    runtime (runtime/src/pjrt_engine.cpp): a PJRT plugin compiles
    <out_dir>/model.mlir.bc directly (PJRT_Program format "mlir"), no
    Python involved. Static shapes — PJRT compiles a concrete program.

    ``bucket_seconds``: variable-length serving (the analogue of the
    reference's dynamic ONNX axes, bin/export_speaker_embedding_onnx.py:
    188-191, discretized for an AOT compiler): export one executable per
    duration bucket as model_f<frames>.mlir.bc; the native CLI picks the
    smallest bucket >= each chunk and circle-pads, with the 10 s-chunk /
    90 s-cap / chunk-mean semantics of infer_sv_batch. The LAST bucket is
    the chunk size. Returns the meta dict."""
    import json
    import os

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def fn(feature):
        with jax.default_matmul_precision(precision):
            return model.apply(variables, feature)

    os.makedirs(out_dir, exist_ok=True)

    def export_one(n_frames, stem):
        exp = jexport.export(jax.jit(fn))(
            jax.ShapeDtypeStruct((batch, n_frames, feat_dim), jnp.float32))
        with open(os.path.join(out_dir, stem + ".mlir.bc"), "wb") as f:
            f.write(exp.mlir_module_serialized)
        # textual form as well: some PJRT plugins reject versioned portable
        # bytecode but take textual StableHLO (the C++ engine tries .bc
        # first)
        with open(os.path.join(out_dir, stem + ".mlir"), "w") as f:
            f.write(exp.mlir_module())
        (emb_shape,) = [o.shape for o in exp.out_avals]
        return int(emb_shape[-1])

    meta = {"feat_dim": feat_dim, "batch": batch,
            "input": "feature [B, T, 80] float32",
            "output": "embedding [B, D] float32",
            "format": "stablehlo mlir bytecode (PJRT_Program 'mlir')"}
    if bucket_seconds:
        buckets = []
        for sec in sorted(float(s) for s in bucket_seconds):
            samples = int(sec * sample_rate)
            n_frames = frames_for_samples(samples)
            emb_dim = export_one(n_frames, f"model_f{n_frames}")
            buckets.append({"seconds": sec, "samples": samples,
                            "frames": n_frames})
        meta.update(embedding_dim=emb_dim, buckets=buckets,
                    sample_rate=sample_rate,
                    chunk_seconds=buckets[-1]["seconds"],
                    max_seconds=90.0,
                    # legacy single-shape keys = largest bucket
                    frames=buckets[-1]["frames"])
    else:
        emb_dim = export_one(frames, "model")
        meta.update(embedding_dim=emb_dim, frames=frames)
    with open(os.path.join(out_dir, "aot.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Export speaker embedding model")
    p.add_argument("--exp_dir", default=None)
    p.add_argument("--model_id", default=None)
    p.add_argument("--local_model_dir", default="pretrained")
    p.add_argument("--out", required=True, help="output .stablehlo path")
    p.add_argument("--aot_dir", default=None,
                   help="also write model.mlir.bc + aot.json for the "
                        "standalone C++ PJRT runtime "
                        "(extract_speaker_embedding --engine aot)")
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--feat_dim", type=int, default=80)
    p.add_argument("--aot_buckets", default=None,
                   help="comma-separated durations in seconds (e.g. "
                        "'1.5,3,6,10') for variable-length AOT serving: "
                        "one executable per bucket; the native CLI picks "
                        "the smallest bucket per chunk and circle-pads "
                        "(infer_sv_batch chunk/mean semantics). The last "
                        "bucket is the chunk size.")
    return p.parse_args(argv)


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import json

    args = get_args(argv)
    if args.exp_dir:
        from speaker3d_tpu.cli.extract import build_model_from_exp

        model, variables, _ = build_model_from_exp(args.exp_dir)
    elif args.model_id:
        from speaker3d_tpu.cli.registry import load_pretrained

        model, variables = load_pretrained(args.model_id, args.local_model_dir)
    else:
        raise SystemExit("one of --exp_dir / --model_id required")

    blob, meta = export_model(model, variables, feat_dim=args.feat_dim,
                              frames=args.frames)

    # verification vs source model (the reference README instructs comparing
    # ONNX vs torch embeddings; we verify automatically before writing)
    import jax

    run = None
    from jax import export as jexport

    exp = jexport.deserialize(blob)
    feats = np.random.default_rng(0).standard_normal(
        (1, args.frames, args.feat_dim)).astype(np.float32)
    got = np.asarray(exp.call(feats))
    with jax.default_matmul_precision("high"):
        want = np.asarray(model.apply(variables, feats))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)

    with open(args.out, "wb") as f:
        f.write(blob)
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported {len(blob)} bytes -> {args.out} (meta: {meta})")

    if args.aot_dir:
        buckets = ([float(s) for s in args.aot_buckets.split(",")]
                   if args.aot_buckets else None)
        aot_meta = export_aot_artifact(model, variables,
                                       args.aot_dir,
                                       feat_dim=args.feat_dim,
                                       frames=args.frames,
                                       bucket_seconds=buckets)
        print(f"AOT artifact -> {args.aot_dir} (meta: {aot_meta})")


if __name__ == "__main__":
    main()
