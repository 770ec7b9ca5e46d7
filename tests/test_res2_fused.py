"""Fused Pallas Res2-block kernel vs the stock ERes2NetV2 XLA path.

Runs the kernel in Pallas interpret mode on CPU (the real Mosaic lowering is
exercised on TPU by tools/bench_fused.py / bench.py). Checks the full-model
integration via the flax interceptor, including: BN folding, stride-2
blocks, time-tiling with halos, non-multiple-of-tile frame counts, and the
time-edge masking that re-creates conv zero-padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker3d_tpu.models.eres2netv2 import ERes2NetV2
from speaker3d_tpu.ops.pallas.res2_block_kernel import (
    fold_res2_block,
    fused_res2_apply_fn,
    res2_block_fused,
)


def _init_model(model, t=40, seed=0):
    feats = jnp.asarray(
        np.random.default_rng(seed).standard_normal((1, t, 80)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), feats)
    # randomize BN stats so folding is actually exercised
    rng = np.random.default_rng(seed + 1)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            rng.uniform(0.5, 1.5, v.shape) if v.ndim else v, v.dtype),
        variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("t", [40, 70])  # 70: non-multiple of t_tile=48
def test_fused_model_matches_stock(t):
    model = ERes2NetV2(num_blocks=(2, 2, 1, 1), m_channels=16, feat_dim=80,
                       embedding_size=32)
    variables = _init_model(model, t=t)
    feats = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, t, 80)), jnp.float32)

    ref = model.apply(variables, feats, train=False)
    fused = fused_res2_apply_fn(model, variables,
                                compute_dtype=jnp.float32,
                                interpret=True)(feats)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_flagship_geometry_small_batch():
    """Default 17.8M geometry (width 26/52) on a short segment."""
    model = ERes2NetV2(feat_dim=80, embedding_size=192)
    variables = _init_model(model, t=50)
    feats = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 50, 80)), jnp.float32)
    ref = model.apply(variables, feats, train=False)
    fused = fused_res2_apply_fn(model, variables,
                                compute_dtype=jnp.float32,
                                interpret=True)(feats)
    cos = float(jnp.sum(ref * fused) /
                (jnp.linalg.norm(ref) * jnp.linalg.norm(fused)))
    assert cos > 0.999999, cos
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_single_block_strides_and_tiling():
    """Kernel-level check against a direct lax.conv reference, both strides,
    multiple time tiles."""
    rng = np.random.default_rng(0)
    cin, w, cout, f, t = 16, 6, 32, 20, 100  # t=100 -> 3 tiles of 48
    params = {
        "conv1": {"kernel": rng.standard_normal((1, 1, cin, 2 * w)) * 0.3},
        "bn1": _bn(rng, 2 * w), "bns.0": _bn(rng, w), "bns.1": _bn(rng, w),
        "convs.0": {"kernel": rng.standard_normal((3, 3, w, w)) * 0.3},
        "convs.1": {"kernel": rng.standard_normal((3, 3, w, w)) * 0.3},
        "conv3": {"kernel": rng.standard_normal((1, 1, 2 * w, cout)) * 0.3},
        "bn3": _bn(rng, cout),
        "shortcut.0": {"kernel": rng.standard_normal((1, 1, cin, cout)) * 0.3},
        "shortcut.1": _bn(rng, cout),
    }
    params = jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float32),
                                    params)
    stats = {k: {"mean": params[k].pop("mean"), "var": params[k].pop("var")}
             for k in ("bn1", "bns.0", "bns.1", "bn3", "shortcut.1")}
    x = jnp.asarray(rng.standard_normal((2, f, t, cin)), jnp.float32)

    for stride in (1, 2):
        folded = fold_res2_block(params, stats)
        got = res2_block_fused(x, folded, stride=stride, interpret=True)
        want = _block_reference(x, params, stats, stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def _bn(rng, n):
    return {"scale": rng.uniform(0.5, 1.5, n), "bias": rng.standard_normal(n),
            "mean": rng.standard_normal(n) * 0.1, "var": rng.uniform(0.5, 2, n)}


def _block_reference(x, params, stats, stride):
    """Direct XLA implementation of the scale=2 block (inference BN)."""
    def bn(h, key):
        g = params[key]["scale"] / jnp.sqrt(stats[key]["var"] + 1e-5)
        return h * g + (params[key]["bias"] - stats[key]["mean"] * g)

    def conv(h, key, s=1, pad=0):
        return jax.lax.conv_general_dilated(
            h, params[key]["kernel"], (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    r20 = lambda v: jnp.clip(v, 0, 20)
    w = params["convs.0"]["kernel"].shape[-1]
    h = r20(bn(conv(x, "conv1", s=stride), "bn1"))
    s1, s2 = h[..., :w], h[..., w:]
    y1 = r20(bn(conv(s1, "convs.0", pad=1), "bns.0"))
    y2 = r20(bn(conv(s2 + y1, "convs.1", pad=1), "bns.1"))
    out = bn(conv(jnp.concatenate([y1, y2], -1), "conv3"), "bn3")
    res = bn(conv(x, "shortcut.0", s=stride), "shortcut.1")
    return r20(out + res)
