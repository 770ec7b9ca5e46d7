"""Split training cost: fwd-only loss vs fwd+bwd grads, one chip, in-jit.

Locates where ERes2NetV2 training time goes relative to the serving path
(docs/BENCH.md): fwd-only should match serving throughput / (1 + small AAM
cost); the fwd+bwd ratio then isolates backward-pass efficiency (the
transposed/narrow-channel convs).

Methodology per docs/DESIGN.md: single-dispatch lax.fori_loop with
per-iteration input variation and a device->host checksum fetch (the
tunnel's block_until_ready does not synchronize; per-dispatch latency is
O(100 ms)).

Run from /root/repo (cwd must supply the import path — no PYTHONPATH on
TPU runs, see CLAUDE.md):
    python -c "exec(open('tools/bench_train_split.py').read())" \
        [batch] [remat|-] [model]
"""

import json
import sys
import time

import numpy as np

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000
NUM_CLASSES = 8000
ITERS = 10


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    remat = len(sys.argv) > 2 and sys.argv[2] == "remat"
    model_name = sys.argv[3] if len(sys.argv) > 3 else "eres2netv2"
    bn_bf16 = len(sys.argv) > 4 and sys.argv[4] == "bnbf16"

    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.train.losses import arc_margin_loss
    from tools.bench_serving import build_model, embed_dim

    model = build_model(model_name)
    for field in ("remat", "memory_efficient"):
        if remat and hasattr(model, field):
            model = model.clone(**{field: True})
            break
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)

    seg = int(SEG_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((batch, seg)) * 0.1)
                       .astype(np.float32))
    labels = jnp.asarray(rng.integers(0, NUM_CLASSES, size=batch)
                         .astype(np.int32))

    feats0 = np.asarray(fbank(wavs[:1]))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, train=True)
    emb_dim = embed_dim(model)
    cls_w = jax.device_put(
        (np.random.default_rng(1).standard_normal((NUM_CLASSES, emb_dim))
         * 0.01).astype(np.float32))
    bb_params = variables["params"]
    batch_stats = variables["batch_stats"]

    def l2norm(x):
        return x / jnp.sqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)

    import contextlib

    from speaker3d_tpu.models.common import bn_compute_dtype

    def loss_fn(trainable, w):
        params, w_cls = trainable
        half = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        feats = fbank(w).astype(jnp.bfloat16)
        ctx = bn_compute_dtype(jnp.bfloat16) if bn_bf16 \
            else contextlib.nullcontext()
        with ctx:
            emb, _ = model.apply({"params": half,
                                  "batch_stats": batch_stats},
                                 feats, train=True, mutable=["batch_stats"])
        emb = emb.astype(jnp.float32)
        cos = l2norm(emb) @ l2norm(w_cls).T
        ce = arc_margin_loss(cos, labels, margin=0.2, scale=32.0)
        return jnp.mean(ce)

    def bench(kind):
        if kind == "fwd":
            def body(i, acc):
                w = wavs * (1.0 + i.astype(jnp.float32) * 1e-6)
                return acc + loss_fn((bb_params, cls_w), w)
        else:
            def body(i, acc):
                w = wavs * (1.0 + i.astype(jnp.float32) * 1e-6)
                loss, grads = jax.value_and_grad(loss_fn)(
                    (bb_params, cls_w), w)
                gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return acc + loss + gsum * 1e-12

        run = jax.jit(lambda: jax.lax.fori_loop(0, ITERS, body,
                                                jnp.float32(0)))
        t0 = time.perf_counter()
        checksum = float(run())  # compile + warm
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        checksum = float(run())
        elapsed = time.perf_counter() - t0
        assert np.isfinite(checksum)
        return batch * SEG_SECONDS * ITERS / elapsed, compile_s

    fwd, c1 = bench("fwd")
    print(json.dumps({"phase": "fwd_only", "model": model_name,
                      "batch": batch, "remat": remat, "bn_bf16": bn_bf16,
                      "audio_s_per_s": round(fwd, 1),
                      "compile_s": round(c1, 1)}), flush=True)
    full, c2 = bench("grad")
    print(json.dumps({"phase": "fwd_bwd", "model": model_name,
                      "batch": batch, "remat": remat, "bn_bf16": bn_bf16,
                      "audio_s_per_s": round(full, 1),
                      "compile_s": round(c2, 1),
                      "bwd_over_fwd": round(fwd / full - 1.0, 2)}),
          flush=True)


if __name__ == "__main__":  # exec(open(...)) in `python -c` hits this too
    main()
