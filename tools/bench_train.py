"""Training throughput benchmark: ERes2NetV2 + vocab-parallel AAM, one chip.

Measures audio-seconds/s/chip for the full compiled train step (fbank on
device, fwd+bwd, SGD) on 3 s crops — the committed, reproducible version of
the ad-hoc measurement behind docs/BENCH.md's training table.

Timing: the train step donates its state, so sequential dispatches pipeline
device-side through the tunnel; we time N steps and force completion with a
final metrics fetch. (The in-jit fori_loop trick used for inference benches
does not apply: state donation and the dict-of-arrays carry make a scan-of-
steps a different executable than production uses.)

Usage: python tools/bench_train.py [batch] [dtype] [remat] [model]
       (default 128 bfloat16 eres2netv2; pass "remat" (or "-") as the 3rd
       arg to enable per-block rematerialization — required for
       batch > 128: B=256 bf16 fwd+bwd needs 29.6 GB of HBM without it,
       13.9 GB over the chip. model: any tools/bench_serving.py name.)
Caution: fwd+bwd remote compiles can take ~10 min cold (CLAUDE.md).
"""

import json
import sys
import time

import numpy as np

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000
NUM_CLASSES = 8000
STEPS = 30


def bench_train(batch=128, dtype="bfloat16", remat=False,
                model_name="eres2netv2"):
    """Measure the production train step; returns the result dict.
    (bench.py reuses this for its driver-visible training line.)"""
    import jax

    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.sv_train import (
        SVTrainConfig,
        init_sv_train_state,
        make_sv_train_step,
    )
    from tools.bench_serving import build_model, embed_dim

    model = build_model(model_name)
    emb_dim = embed_dim(model)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    cfg = SVTrainConfig(num_classes=NUM_CLASSES, embedding_size=emb_dim,
                        step_per_epoch=1000, compute_dtype=dtype,
                        remat=remat)
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)

    seg = int(SEG_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((batch, seg)) * 0.1).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, size=batch).astype(np.int32)

    feats0 = np.asarray(fbank(wavs[:1]))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, train=True)
    state = init_sv_train_state(jax.random.PRNGKey(0), model, feats0, cfg,
                                mesh, backbone_variables=variables)
    host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_sv_train_step(model, cfg, mesh, host_state, feature_fn=fbank)

    # pre-upload the batch ONCE: per-dispatch numpy inputs re-upload 49 MB
    # of wavs through this harness's tunnel every step (~1 s each, the
    # thing data/prefetch.py hides in the real trainers) and would measure
    # the link, not the device (578 vs ~1.3k audio-s/s at B=128).
    import jax as _jax

    batch_d = _jax.device_put({"wavs": wavs, "labels": labels})
    state, metrics = step(state, batch_d)           # compile
    _ = float(metrics["loss"])                      # force
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch_d)
    _ = float(metrics["loss"])                      # fetch = completion
    elapsed = time.perf_counter() - t0

    value = batch * SEG_SECONDS * STEPS / elapsed
    return {
        "metric": "train_throughput", "model": model_name,
        "batch": batch, "dtype": dtype, "remat": remat, "steps": STEPS,
        "value": round(value, 1), "unit": "audio-seconds/s/chip",
        "utts_per_s": round(batch * STEPS / elapsed, 1),
    }


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    remat = len(sys.argv) > 3 and sys.argv[3] == "remat"
    model_name = sys.argv[4] if len(sys.argv) > 4 else "eres2netv2"
    print(json.dumps(bench_train(batch, dtype, remat, model_name)))


if __name__ == "__main__":
    main()
