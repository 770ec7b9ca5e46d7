"""Batch-size sweep for ERes2NetV2 bf16 serving throughput.

Checks whether the headline bench batch leaves throughput on the table —
larger batches amortize per-op fixed costs; smaller ones may fit cache
better. Result (docs/BENCH.md): amortization saturates by B=128 (7,437)
and B=256 is slightly slower (7,255), so bench.py runs at B=128 — note the
B=128-vs-256 margin (~2.5%) is near the documented run-to-run spread
(~1.3%), so "optimal" means "at the plateau", not a material win.
Same methodology as bench.py (in-jit fori_loop, per-iteration input
variation, device->host checksum fetch; see docs/DESIGN.md and CLAUDE.md
for why naive timing is invalid here), with ITERS=20 per point vs
bench.py's 40 — half the audio volume per timed dispatch.

Usage: python tools/bench_batch_sweep.py [B1 B2 ...]  (default 128 256 512)
"""

import json
import sys
import time

import numpy as np

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000
ITERS = 20


def measure(batch: int) -> float:
    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    model = ERes2NetV2(feat_dim=80, embedding_size=192)
    seg = int(SEG_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((batch, seg)) * 0.1)
                       .astype(np.float32))
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    feats0 = np.asarray(fbank(wavs[:1]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def run(w):
        def body(i, acc):
            wi = w * (1.0 + i.astype(jnp.float32) * 1e-6)
            emb = model.apply(variables, fbank(wi).astype(jnp.bfloat16))
            return acc + jnp.sum(jnp.square(emb.astype(jnp.float32)))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    _ = float(run(wavs))  # compile + warm
    t0 = time.perf_counter()
    checksum = float(run(wavs))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return batch * SEG_SECONDS * ITERS / elapsed


def main():
    batches = [int(b) for b in sys.argv[1:]] or [128, 256, 512]
    results = {}
    for b in batches:
        results[str(b)] = round(measure(b), 1)
        print(json.dumps({"batch": b,
                          "audio_s_per_s": results[str(b)]}), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
