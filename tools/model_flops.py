"""Per-model forward FLOP accounting from XLA's own cost analysis.

Feeds the MFU columns in docs/BENCH.md: GFLOP per audio-second for each
serving backbone (fbank + model forward, 3 s segment), from
``jax.jit(...).lower(...).compile().cost_analysis()['flops']`` — the
compiler's count for the optimized HLO, not a hand estimate. Runs on CPU
(the HLO math is the same); MFU = measured audio-s/s x GFLOP/audio-s
divided by chip peak.

Cross-check: the reference self-reports ERes2NetV2 at 12.69 GMACs per 300
frames (reference: models/eres2net/ERes2NetV2.py:264-265) = 8.46 GFLOP per
audio-second; XLA's count for our forward is within a few percent.

Usage (CPU-safe):  python tools/model_flops.py [model ...]
Prints one JSON line per model: {"model", "gflop_per_audio_s"}.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000
BATCH = 16

ALL_MODELS = ["eres2netv2", "eres2netv2_w24s4ep4", "eres2net_base",
              "eres2net_large", "eres2net_huge", "campplus", "ecapa",
              "resnet34", "res2net", "xvector"]


def gflop_per_audio_second(name: str) -> float:
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from tools.bench_serving import build_model

    model = build_model(name)
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    seg = int(SEG_SECONDS * SAMPLE_RATE)
    wavs = np.zeros((BATCH, seg), np.float32)
    feats0 = np.asarray(fbank(wavs[:1]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)

    def fwd(w):
        return model.apply(variables, fbank(w))

    compiled = jax.jit(fwd).lower(wavs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops = float(cost["flops"])
    return flops / (BATCH * SEG_SECONDS) / 1e9


def main():
    names = sys.argv[1:] or ALL_MODELS
    for name in names:
        g = gflop_per_audio_second(name)
        print(json.dumps({"model": name,
                          "gflop_per_audio_s": round(g, 3)}), flush=True)


if __name__ == "__main__":
    main()
