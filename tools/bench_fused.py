"""A/B bench: stock XLA ERes2NetV2 serving path vs fused Pallas Res2 blocks.

Methodology identical to bench.py (docs/DESIGN.md): timing loop inside one
jit via lax.fori_loop with per-iteration input variation, device->host
checksum fetch; bf16 serving dtype with fp32-accumulate accuracy gate.

Usage: python tools/bench_fused.py [--batch 256] [--iters 20] [--skip_stock]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--t_tile", type=int, default=32)
    ap.add_argument("--vmem_mb", type=int, default=0)
    ap.add_argument("--skip_stock", action="store_true")
    ap.add_argument("--skip_fused", action="store_true",
                    help="stock-only run (e.g. batch-size sweeps)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.ops.pallas.res2_block_kernel import fused_res2_apply_fn

    print(f"devices: {jax.devices()}", flush=True)
    model = ERes2NetV2(feat_dim=80, embedding_size=192)
    seg = int(SEG_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((args.batch, seg)) * 0.1)
                       .astype(np.float32))

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    feats0 = np.asarray(fbank(wavs[:1]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)
    variables_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    fused_fn = fused_res2_apply_fn(
        model, variables, compute_dtype=jnp.bfloat16, t_tile=args.t_tile,
        vmem_limit_bytes=args.vmem_mb * 2**20 if args.vmem_mb else None)

    # --- accuracy gate ------------------------------------------------------
    @jax.jit
    def embed_ref(w):
        with jax.default_matmul_precision("highest"):
            return model.apply(variables, fbank(w))

    @jax.jit
    def embed_fused(w):
        return fused_fn(fbank(w).astype(jnp.bfloat16)).astype(jnp.float32)

    if not args.skip_fused:
        small = wavs[:16]
        print("compiling fp32 reference...", flush=True)
        e_ref = np.asarray(embed_ref(small))
        print("compiling fused path (Mosaic)...", flush=True)
        t0 = time.perf_counter()
        e_fused = np.asarray(embed_fused(small))
        print(f"fused small-batch compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        cos = np.sum(e_ref * e_fused, -1) / (
            np.linalg.norm(e_ref, axis=-1) * np.linalg.norm(e_fused, axis=-1))
        print(f"fused vs fp32 min cosine: {cos.min():.6f}", flush=True)
        assert cos.min() > 0.999, "fused path accuracy gate failed"

    def timed(apply_bf16, label):
        @jax.jit
        def run(w):
            def body(i, acc):
                wi = w * (1.0 + i.astype(jnp.float32) * 1e-6)
                emb = apply_bf16(fbank(wi).astype(jnp.bfloat16))
                return acc + jnp.sum(jnp.square(emb.astype(jnp.float32)))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        print(f"compiling {label} timed loop...", flush=True)
        t0 = time.perf_counter()
        _ = float(run(wavs))
        print(f"  compile+warm: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        checksum = float(run(wavs))
        elapsed = time.perf_counter() - t0
        assert np.isfinite(checksum)
        audio_s = args.batch * SEG_SECONDS * args.iters
        print(f"{label}: {audio_s/elapsed:.1f} audio-s/s "
              f"({elapsed*1000/args.iters:.2f} ms/batch)", flush=True)
        return audio_s / elapsed

    results = {}
    if not args.skip_stock:
        results["stock"] = timed(
            lambda f: model.apply(variables_bf16, f), "stock-bf16")
    if not args.skip_fused:
        results["fused"] = timed(fused_fn, "fused-bf16")
    if "stock" in results and "fused" in results:
        print(f"speedup: {results['fused']/results['stock']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
