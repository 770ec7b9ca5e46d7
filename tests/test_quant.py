"""Post-training int8 quantization: accuracy against the fp32 path.

(beyond-reference capability; see speaker3d_tpu/eval/quant.py — the
reference serves fp32 ONNX)."""

import numpy as np
import pytest


def _cosine(a, b):
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                * np.linalg.norm(b, axis=-1))


@pytest.mark.parametrize("which", ["eres2netv2", "ecapa", "campplus"])
def test_int8_quantized_forward_matches_fp32(which):
    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.eval.quant import calibrate_act_scales, quantized_apply_fn
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    if which == "eres2netv2":
        from speaker3d_tpu.models.eres2netv2 import ERes2NetV2

        model = ERes2NetV2(feat_dim=80, embedding_size=64, m_channels=16)
    elif which == "ecapa":
        from speaker3d_tpu.models.ecapa_tdnn import ECAPA_TDNN

        model = ECAPA_TDNN(channels=(64, 64, 64, 64, 192), lin_neurons=32,
                           attention_channels=32)
    else:
        from speaker3d_tpu.models.campplus import CAMPPlus

        model = CAMPPlus(feat_dim=80, embedding_size=64, growth_rate=8,
                         init_channels=16)

    fb = KaldiFbank(FbankConfig(), mean_norm=True)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((4, 32000)) * 0.1).astype(np.float32)
    feats = np.asarray(fb(wavs))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats[:1], train=False)
    ref = np.asarray(model.apply(variables, feats, train=False))

    scales = calibrate_act_scales(model, variables, feats[:2])
    assert len(scales) > 5  # convs/denses were actually intercepted
    qfn = jax.jit(quantized_apply_fn(model, variables, scales,
                                     compute_dtype=jnp.float32))
    q = np.asarray(qfn(feats))
    cos = _cosine(ref, q)
    assert cos.min() > 0.99, (which, cos)
