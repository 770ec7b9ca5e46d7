"""Benchmark: speaker-embedding extraction throughput on one chip.

Measures audio-seconds processed per second per chip for the full device
pipeline (Kaldi fbank -> ERes2NetV2 17.8M embedding) on 3-second segments —
the hot path of SV batch inference and diarization (SURVEY.md §3.2/3.3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is computed against an estimated V100 torch fp32 throughput of
500 audio-s/s: ERes2NetV2 is 12.69 GMACs / 300 frames (= 3 s of audio,
reference: models/eres2net/ERes2NetV2.py:264-265) -> ~8.5 GFLOP per audio-s;
a V100 at ~15 TFLOPs and ~30% utilization sustains ~500 audio-s/s.

The timing loop runs INSIDE one jit dispatch (lax.fori_loop over batches)
with a device->host checksum fetch at the end: on this harness's tunneled
TPU, per-dispatch latency is O(100ms) and ``block_until_ready`` does not
actually synchronize, so only a single-dispatch loop + forced fetch measures
true device throughput.
"""

import json
import time

import numpy as np

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000
BATCH = 128
ITERS = 20
V100_BASELINE_AUDIO_S_PER_S = 500.0


def main():
    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    model = ERes2NetV2(feat_dim=80, embedding_size=192)
    seg = int(SEG_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((ITERS, BATCH, seg)) * 0.1).astype(np.float32)

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    feats0 = np.asarray(fbank(wavs[0, :1]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)

    # accuracy-grade path: fp32 fbank + fp32-accumulate ('high') backbone —
    # measured <=1e-6 cosine drift vs 'highest', well inside the 1e-3 gate
    def embed_batch(w):
        feats = fbank(w)
        with jax.default_matmul_precision("high"):
            return model.apply(variables, feats)

    @jax.jit
    def run(all_wavs):
        def body(i, acc):
            emb = embed_batch(all_wavs[i])
            return acc + jnp.sum(jnp.square(emb))

        return jax.lax.fori_loop(0, all_wavs.shape[0], body, jnp.float32(0))

    wavs_dev = jax.device_put(wavs)
    _ = float(run(wavs_dev))  # compile + warm

    t0 = time.perf_counter()
    checksum = float(run(wavs_dev))  # single dispatch; fetch forces completion
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)

    audio_seconds = BATCH * SEG_SECONDS * ITERS
    value = audio_seconds / elapsed
    print(json.dumps({
        "metric": "embedding_extraction_throughput",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / V100_BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
