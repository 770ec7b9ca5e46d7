"""Benchmark: serving AND training throughput on one chip.

Line 1 — speaker-embedding extraction: audio-seconds processed per second
per chip for the full device pipeline (Kaldi fbank -> ERes2NetV2 17.8M
embedding) on 3-second segments — the hot path of SV batch inference and
diarization (SURVEY.md §3.2/3.3).

Line 2 — training: the production compiled train step (fbank on device,
fwd+bwd through ERes2NetV2 + vocab-parallel AAM, SGD) at the measured-
optimal B=128 bf16 config, via tools/bench_train.py's methodology. Emitted
so training regressions are driver-visible, not docs-only (VERDICT r2).

Each line is JSON: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is computed against an estimated V100 torch fp32 throughput of
500 audio-s/s: ERes2NetV2 is 12.69 GMACs / 300 frames (= 3 s of audio,
reference: models/eres2net/ERes2NetV2.py:264-265) -> ~8.5 GFLOP per audio-s;
a V100 at ~15 TFLOPs and ~30% utilization sustains ~500 audio-s/s. The
training baseline divides by 3 (fwd+bwd ~= 3x forward FLOPs) -> ~167
audio-s/s per V100.

Measurement discipline (docs/DESIGN.md): on this harness's tunneled TPU,
``block_until_ready`` does not synchronize and per-dispatch latency is
O(100 ms), so the timing loop runs INSIDE one jit dispatch (lax.fori_loop)
with per-iteration input variation (defeats CSE across iterations) and a
device->host checksum fetch to force completion.

Precision: the benched serving config is bf16 params+activations with fp32
fbank; the run self-validates embeddings against the fp32-accumulate
('highest') path and requires cosine > 0.999 (the parity gate is 1e-3
drift; measured drift is ~1e-5).
"""

import json
import time

import numpy as np

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000
# B=128 sits at the measured serving-throughput plateau on v5e: batch
# amortization saturates by 128 and B=256 ran slightly slower (7,437 vs
# 7,255 audio-s/s, tools/bench_batch_sweep.py; docs/BENCH.md) — a ~2.5%
# margin close to the ~1.3% run-to-run spread, so treat 128 as "on the
# plateau", not materially faster. ITERS doubled to keep the same audio
# volume per timed dispatch.
BATCH = 128
ITERS = 40
V100_BASELINE_AUDIO_S_PER_S = 500.0
V100_TRAIN_BASELINE_AUDIO_S_PER_S = V100_BASELINE_AUDIO_S_PER_S / 3.0


def main():
    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    model = ERes2NetV2(feat_dim=80, embedding_size=192)
    seg = int(SEG_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((BATCH, seg)) * 0.1)
                       .astype(np.float32))

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    feats0 = np.asarray(fbank(wavs[:1]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)
    variables_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    # --- accuracy gate: bf16 serving path vs fp32-accumulate reference -----
    @jax.jit
    def embed_ref(w):
        with jax.default_matmul_precision("highest"):
            return model.apply(variables, fbank(w))

    @jax.jit
    def embed_bf16(w):
        return model.apply(variables_bf16,
                           fbank(w).astype(jnp.bfloat16)).astype(jnp.float32)

    small = wavs[:16]
    e_ref = np.asarray(embed_ref(small))
    e_b16 = np.asarray(embed_bf16(small))
    cos = np.sum(e_ref * e_b16, -1) / (
        np.linalg.norm(e_ref, axis=-1) * np.linalg.norm(e_b16, axis=-1))
    assert cos.min() > 0.999, f"bf16 drift too large: min cosine {cos.min()}"

    # --- tunnel condition probe (diagnostic line, not a perf claim) --------
    # This harness reaches the chip through a shared tunnel whose BULK
    # bandwidth fluctuates ~6x hour-to-hour (measured 10 vs 60 MB/s the
    # same day; CLAUDE.md). The in-jit serving/train lines are insensitive
    # to it, but the diarization line's per-batch chunk uploads are — this
    # line records the conditions the other lines were measured under.
    try:
        probe = jax.jit(lambda b, i: jnp.sum(b) * i)
        big = (rng.standard_normal((BATCH, seg)) * 0.1).astype(np.float32)
        _ = float(probe(big, 1.0))  # compile
        lat = []
        tiny = jnp.ones((1024,), jnp.float32)
        tprobe = jax.jit(lambda x, i: x * i)
        _ = np.asarray(tprobe(tiny, 1.0))
        for i in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(tprobe(tiny, float(i + 2)))
            lat.append(time.perf_counter() - t0)
        # pre-materialize the perturbed arrays so the timed region is
        # device_put + dispatch + scalar fetch only (not a 24.6 MB host
        # multiply on this 2-core box — ADVICE r4)
        perturbed = [big * (1.0 + i * 1e-6) for i in range(3)]
        ups = []
        for i, arr in enumerate(perturbed):
            t0 = time.perf_counter()
            _ = float(probe(arr, float(i + 2)))
            ups.append(time.perf_counter() - t0)
        mb = big.nbytes / 1e6
        bw = mb / float(np.median(ups))
        print(json.dumps({
            "metric": "tunnel_upload_bandwidth",
            "value": round(bw, 1),
            "unit": "MB/s",
            # vs the ~60 MB/s measured in a healthy hour (docs/BENCH.md)
            "vs_baseline": round(bw / 60.0, 3),
            "dispatch_latency_ms": round(1e3 * float(np.median(lat)), 1),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"tunnel probe failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    # --- timed run ---------------------------------------------------------
    @jax.jit
    def run(w):
        def body(i, acc):
            wi = w * (1.0 + i.astype(jnp.float32) * 1e-6)  # defeat CSE
            emb = model.apply(variables_bf16,
                              fbank(wi).astype(jnp.bfloat16))
            return acc + jnp.sum(jnp.square(emb.astype(jnp.float32)))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    _ = float(run(wavs))  # compile + warm
    t0 = time.perf_counter()
    checksum = float(run(wavs))  # single dispatch; fetch forces completion
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)

    audio_seconds = BATCH * SEG_SECONDS * ITERS
    value = audio_seconds / elapsed
    print(json.dumps({
        "metric": "embedding_extraction_throughput",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / V100_BASELINE_AUDIO_S_PER_S, 3),
    }), flush=True)

    # --- end-to-end diarization line (VERDICT r3 item 4): a 10-min
    # synthetic conversation through the FULL pipeline — host VAD +
    # post-processing, sliding 1.5 s/0.75 s chunks, batched bf16 flagship
    # embeddings, AHC (fork defaults) — so the product number (docs/BENCH.md
    # 60-127x realtime) is driver-visible and regression-guarded, with the
    # host/device stage breakdown in the parsed output. Guarded: a failure
    # here must not void the serving line already printed.
    try:
        from speaker3d_tpu.diar.pipeline import DiarizationPipeline
        from tools.bench_diarization import synth_conversation

        @jax.jit
        def embed_pipe(w):
            return model.apply(variables_bf16,
                               fbank(w).astype(jnp.bfloat16)
                               ).astype(jnp.float32)

        pipe = DiarizationPipeline(embed_pipe, batch_size=BATCH)
        wav10 = synth_conversation(10.0)
        pipe(wav10[: SAMPLE_RATE * 30])  # compile the 1.5 s-chunk batch
        t0 = time.perf_counter()
        pipe(wav10)  # cold: first full-length pass
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fields = pipe(wav10)  # warm steady state
        elapsed = time.perf_counter() - t0
        audio_s = wav10.shape[0] / SAMPLE_RATE
        value = audio_s / elapsed
        print(json.dumps({
            "metric": "diarization_realtime_factor",
            "value": round(value, 2),
            "unit": "x-realtime",
            # the reference publishes no diarization throughput (only the
            # per-file RTF sidecar mechanism) -> baseline is realtime (1x)
            "vs_baseline": round(value, 2),
            "audio_seconds": audio_s,
            "cold_s": round(cold, 2),
            "segments": len(fields),
            "chunks": len(pipe.last_chunks),
            "stages_s": {k: round(v, 3)
                         for k, v in pipe.last_stage_times.items()},
            # r5: audio is device-resident (one upload per file; int16 when
            # the source is PCM16-exact) — wire shows what actually shipped
            "wire": pipe.last_wire,
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"diarization bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    # --- multi-model serving line (VERDICT r4 item 6): guard the zoo's
    # serving table (docs/BENCH.md), not just the flagship. Same in-jit
    # methodology; vs_baseline = worst-case ratio vs the docs values, so a
    # regression in ANY of the three is driver-visible. Guarded: a failure
    # must not void the lines already printed.
    try:
        from tools.bench_serving import build_model

        # (doc value, batch it was measured at): small models keep scaling
        # past B=128 — CAM++ measures 29.6k at B=128 vs 42.7k at B=256
        # (r5), so each model benches at its documented batch
        DOC_SERVING = {"campplus": (42248.0, 256),
                       "ecapa": (55401.0, 128),
                       "resnet34": (23821.0, 128)}
        per_model = {}
        for name, (_doc, mb) in DOC_SERVING.items():
            m = build_model(name)
            v = jax.jit(m.init)(jax.random.PRNGKey(0), feats0)
            v16 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, v)
            w_in = (jnp.concatenate([wavs, wavs]) if mb == 2 * BATCH
                    else wavs[:mb])
            assert w_in.shape[0] == mb, (
                f"{name}: batch {w_in.shape[0]} != documented {mb} — "
                f"throughput would mis-scale")

            @jax.jit
            def run_m(w, m=m, v16=v16):
                def body(i, acc):
                    wi = w * (1.0 + i.astype(jnp.float32) * 1e-6)
                    emb = m.apply(v16, fbank(wi).astype(jnp.bfloat16))
                    return acc + jnp.sum(jnp.square(
                        emb.astype(jnp.float32)))
                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

            _ = float(run_m(w_in))  # compile + warm
            t0 = time.perf_counter()
            c = float(run_m(w_in))
            dt = time.perf_counter() - t0
            assert np.isfinite(c)
            per_model[name] = round(mb * SEG_SECONDS * ITERS / dt, 1)
        print(json.dumps({
            "metric": "multi_model_serving_throughput",
            "value": per_model,
            "unit": "audio-seconds/s/chip",
            "vs_baseline": round(min(per_model[k] / DOC_SERVING[k][0]
                                     for k in per_model), 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"multi-model bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    # --- SSL train line (VERDICT r4 item 6): SDPN in-jit step throughput,
    # guarding the docs/BENCH.md SSL table (6,926 audio-s/s @ B=64).
    try:
        from tools.bench_train_ssl import bench_ssl

        res = bench_ssl("sdpn", 64)
        print(json.dumps({
            "metric": "ssl_train_throughput",
            "value": res["value"],
            "unit": "audio-seconds/s/chip",
            "vs_baseline": round(res["value"] / 6926.0, 3),
            "variant": res["variant"], "batch": res["batch"],
            "mode": res["mode"],
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"ssl train bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    # --- training line (B=128 bf16, the throughput-optimal single-chip
    # config per docs/BENCH.md; fwd+bwd remote compile can take ~10 min
    # cold, see CLAUDE.md). Guarded: a failure here must not void the
    # serving line already printed.
    try:
        from tools.bench_train import bench_train

        res = bench_train(batch=BATCH, dtype="bfloat16")
        print(json.dumps({
            "metric": "train_step_throughput",
            "value": res["value"],
            "unit": "audio-seconds/s/chip",
            "vs_baseline": round(
                res["value"] / V100_TRAIN_BASELINE_AUDIO_S_PER_S, 3),
            "batch": res["batch"], "dtype": res["dtype"],
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"train bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
