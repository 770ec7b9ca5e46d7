"""Parity tests: every Flax backbone vs its reference torch model,
weight-for-weight (torch state_dict converted mechanically).

Each test instantiates the randomly-initialized reference model as the golden
oracle; matching outputs gate both architecture and converter correctness.
"""

import sys

import numpy as np
import pytest

from tests.conftest import has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")

sys.path.insert(0, "/root/reference")


def _convert_and_compare(tm, fm, x, atol=2e-4):
    import jax
    import torch

    from speaker3d_tpu.compat import load_into_model

    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    variables = load_into_model(fm, tm.state_dict(), x[:1])
    out = np.asarray(jax.jit(fm.apply)(variables, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-3)
    return out, ref


def _x(t=200, f=80, b=2, seed=0):
    return np.random.default_rng(seed).standard_normal((b, t, f)).astype(np.float32)


def test_ecapa_parity():
    import torch
    from speakerlab.models.ecapa_tdnn.ECAPA_TDNN import ECAPA_TDNN as TorchECAPA

    from speaker3d_tpu.models.ecapa_tdnn import ECAPA_TDNN

    torch.manual_seed(0)
    tm = TorchECAPA(input_size=80, lin_neurons=192)
    n = sum(p.numel() for p in tm.parameters())
    assert abs(n / 1e6 - 6.19) < 0.2  # 512-ch config (released 1024-ch = 20.8M)
    _convert_and_compare(tm, ECAPA_TDNN(input_size=80, lin_neurons=192), _x())


def test_eres2net_base_parity():
    import torch
    from speakerlab.models.eres2net.ERes2Net import ERes2Net as TorchERes2Net

    from speaker3d_tpu.models.eres2net import eres2net_base

    torch.manual_seed(0)
    tm = TorchERes2Net(feat_dim=80, embedding_size=192)
    n = sum(p.numel() for p in tm.parameters())
    assert abs(n / 1e6 - 6.61) < 0.1
    _convert_and_compare(tm, eres2net_base(feat_dim=80, embedding_size=192), _x())


def test_eres2net_huge_parity():
    import torch
    from speakerlab.models.eres2net.ERes2Net_huge import ERes2Net as TorchHuge

    from speaker3d_tpu.models.eres2net import eres2net_huge

    torch.manual_seed(0)
    tm = TorchHuge(feat_dim=80, embedding_size=192)
    _convert_and_compare(tm, eres2net_huge(feat_dim=80, embedding_size=192),
                         _x(t=120))


def test_res2net_parity():
    import torch
    from speakerlab.models.res2net.Res2Net import Res2Net as TorchRes2Net

    from speaker3d_tpu.models.res2net import Res2Net

    torch.manual_seed(0)
    tm = TorchRes2Net(feat_dim=80, embedding_size=192)
    n = sum(p.numel() for p in tm.parameters())
    assert abs(n / 1e6 - 4.03) < 0.1
    _convert_and_compare(tm, Res2Net(feat_dim=80, embedding_size=192), _x())


def test_resnet34_parity():
    import torch
    from speakerlab.models.resnet.ResNet import ResNet as TorchResNet

    from speaker3d_tpu.models.resnet import ResNet

    torch.manual_seed(0)
    tm = TorchResNet(feat_dim=80, embedding_size=192, two_emb_layer=False)
    n = sum(p.numel() for p in tm.parameters())
    assert abs(n / 1e6 - 6.34) < 0.2
    _convert_and_compare(
        tm, ResNet(feat_dim=80, embedding_size=192, two_emb_layer=False), _x())


def test_xvector_parity():
    import torch
    from speakerlab.models.xvector.TDNN import Xvector as TorchXvector

    from speaker3d_tpu.models.xvector import Xvector

    torch.manual_seed(0)
    tm = TorchXvector(feat_dim=80, embed_dim=512)
    n = sum(p.numel() for p in tm.parameters())
    assert abs(n / 1e6 - 4.34) < 0.2
    _convert_and_compare(tm, Xvector(feat_dim=80, embed_dim=512), _x())


def test_cosine_classifier_parity():
    import torch
    from speakerlab.models.campplus.classifier import (
        CosineClassifier as TorchCosine)

    from speaker3d_tpu.models.classifier import CosineClassifier

    torch.manual_seed(0)
    tm = TorchCosine(192, num_blocks=0, out_neurons=100)
    x = np.random.default_rng(1).standard_normal((4, 192)).astype(np.float32)
    _convert_and_compare(tm, CosineClassifier(192, out_neurons=100), x)


def test_remat_options_preserve_params_and_outputs():
    """Per-block/per-layer remat options (ERes2NetV2.remat, ERes2Net.remat,
    CAMPPlus.memory_efficient — the reference's torch-checkpointing flag,
    models/campplus/DTDNN.py:50) must not change parameter paths or
    forward outputs."""
    import jax

    from speaker3d_tpu.models.campplus import CAMPPlus
    from speaker3d_tpu.models.eres2net import ERes2Net
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2

    x = np.random.default_rng(0).standard_normal((2, 40, 24)).astype(
        np.float32)
    cases = [
        (ERes2NetV2(num_blocks=(1, 1, 1, 1), m_channels=8, feat_dim=24,
                    embedding_size=16), "remat"),
        (ERes2Net(num_blocks=(1, 1, 1, 1), m_channels=8, feat_dim=24,
                  embedding_size=16), "remat"),
        (CAMPPlus(feat_dim=24, embedding_size=16, growth_rate=4,
                  init_channels=8), "memory_efficient"),
    ]
    for base, field in cases:
        opt = base.clone(**{field: True})
        va = base.init(jax.random.PRNGKey(0), x)
        vb = opt.init(jax.random.PRNGKey(0), x)
        pa = jax.tree_util.tree_flatten_with_path(va)[0]
        pb = jax.tree_util.tree_flatten_with_path(vb)[0]
        assert [str(k) for k, _ in pa] == [str(k) for k, _ in pb], type(base)
        ya = np.asarray(base.apply(va, x))
        yb = np.asarray(opt.apply(vb, x))
        np.testing.assert_allclose(ya, yb, atol=1e-5, rtol=1e-5,
                                   err_msg=str(type(base)))
