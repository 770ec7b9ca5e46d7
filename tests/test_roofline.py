"""Pin tools/roofline.py's analytic per-stage FLOP inventory.

The roofline table's credibility rests on its stage FLOPs matching the
real model; XLA's own cost analysis of the compiled flagship forward
measured 8.26 GFLOP/audio-s (tools/model_flops.py, docs/BENCH.md) =
24.78 GFLOP per 3 s sample. An accidental edit to the conv inventory
(wrong channel count, missing block) would silently skew every ceiling."""

import numpy as np


def _load_specs():
    src = open("tools/roofline.py").read().split("def bench_fn")[0]
    g = {}
    exec(src, g)  # noqa: S102 - our own tool's header, no jax imports
    return g


def test_stage_flops_match_xla_whole_model():
    g = _load_specs()
    specs = g["stage_specs"](1)
    assert set(specs) == {"stem", "layer1", "layer2", "layer3", "layer4",
                          "fuse+head"}
    total = sum(f for f, _ in specs.values())
    xla_total = 8.26e9 * 3.0  # tools/model_flops.py measurement
    assert abs(total - xla_total) / xla_total < 0.05, (total, xla_total)
    # every ceiling must be positive and <= peak
    for name, (f, c) in specs.items():
        assert 0 < c <= g["PEAK_BF16"], (name, c)
        assert f > 0, name


def test_conv_cost_formula():
    g = _load_specs()
    # 1x1 conv, full MXU fill on both dims
    f, c = g["conv_cost"](2, 10, 20, 256, 256, 1, 1)
    assert f == 2.0 * 2 * 10 * 20 * 256 * 256
    assert c == g["PEAK_BF16"]
    # width-26 3x3: Cout fill 26/128, K = 26*9 > 128 -> full K fill
    f, c = g["conv_cost"](1, 80, 300, 26, 26, 3, 3)
    assert np.isclose(c, g["PEAK_BF16"] * 26 / 128)
    # stem: Cout 64/128, K = 9/128
    f, c = g["conv_cost"](1, 80, 300, 1, 64, 3, 3)
    assert np.isclose(c, g["PEAK_BF16"] * (64 / 128) * (9 / 128))
