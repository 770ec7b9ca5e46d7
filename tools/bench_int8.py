"""A/B: bf16 vs int8-quantized ERes2NetV2 serving throughput on one chip.

Same in-jit timing discipline as bench.py. Also validates int8 embeddings
against the fp32-accumulate path (gate: min cosine > 0.99).

Run ON TPU: python tools/bench_int8.py [--batch 256] [--iters 20]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SEG = 48000


def timed_loop(fn, x, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(i, acc):
            y = fn(x * (1.0 + i * 1e-6))
            return acc + jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    _ = float(np.asarray(loop(x)))
    t0 = time.perf_counter()
    _ = float(np.asarray(loop(x)))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.eval.quant import calibrate_act_scales, quantized_apply_fn
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    model = ERes2NetV2(feat_dim=80, embedding_size=192)
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((args.batch, SEG)) * 0.1)
                       .astype(np.float32))
    feats0 = np.asarray(fbank(wavs[:2]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)

    # fp32-accumulate reference embeddings for the accuracy gate
    @jax.jit
    def ref_fn(w):
        with jax.default_matmul_precision("highest"):
            return model.apply(variables, fbank(w), train=False)

    ref = np.asarray(ref_fn(wavs[:16]))
    print("ref done", flush=True)

    scales = calibrate_act_scales(model, variables, feats0)
    qapply = quantized_apply_fn(model, variables, scales)

    def q_fn(w):
        return qapply(fbank(w))

    q = np.asarray(jax.jit(q_fn)(wavs[:16]))
    cos = np.sum(ref * q, -1) / (np.linalg.norm(ref, axis=-1)
                                 * np.linalg.norm(q, axis=-1))
    print(f"int8 cosine vs fp32: min {cos.min():.6f}", flush=True)

    vars_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    def bf16_fn(w):
        return model.apply(vars_bf16, fbank(w).astype(jnp.bfloat16),
                           train=False)

    dt_bf16 = timed_loop(bf16_fn, wavs, args.iters)
    a_s = args.batch * 3.0
    print(f"bf16: {dt_bf16*1e3:.2f} ms/batch = {a_s/dt_bf16:.0f} audio-s/s",
          flush=True)

    dt_int8 = timed_loop(q_fn, wavs, args.iters)
    print(f"int8: {dt_int8*1e3:.2f} ms/batch = {a_s/dt_int8:.0f} audio-s/s",
          flush=True)

    print(json.dumps({"bf16_audio_s_per_s": a_s / dt_bf16,
                      "int8_audio_s_per_s": a_s / dt_int8,
                      "speedup": dt_bf16 / dt_int8,
                      "min_cosine": float(cos.min())}))


if __name__ == "__main__":
    main()
