"""Parity: our Flax ERes2NetV2 vs the reference torch model, weight-for-weight.

The reference torch model (random torch init) is the golden oracle: we convert
its state_dict into our Flax variables and require matching embeddings. This
gates both the architecture and the converter.
"""

import numpy as np
import pytest

from tests.conftest import has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def _torch_model(**kw):
    import sys
    sys.path.insert(0, "/root/reference")
    import torch
    from speakerlab.models.eres2net.ERes2NetV2 import ERes2NetV2 as TorchERes2NetV2

    torch.manual_seed(0)
    m = TorchERes2NetV2(feat_dim=80, embedding_size=192, **kw)
    m.eval()
    return m


def _parity(torch_kw, flax_kw, atol=2e-4):
    import jax
    import torch

    from speaker3d_tpu.compat import load_into_model
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2

    tm = _torch_model(**torch_kw)
    x = np.random.default_rng(0).standard_normal((2, 200, 80)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    fm = ERes2NetV2(feat_dim=80, embedding_size=192, **flax_kw)
    variables = load_into_model(fm, tm.state_dict(), x[:1])
    out = np.asarray(jax.jit(fm.apply)(variables, x))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-3)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 1 - 1e-5), cos


def test_eres2netv2_default_parity():
    _parity({}, {})


def test_eres2netv2_w24s4ep4_parity():
    _parity(dict(baseWidth=24, scale=4, expansion=4),
            dict(base_width=24, scale=4, expansion=4))


def test_param_count_matches_reference():
    import jax

    from speaker3d_tpu.compat import variables_shape_tree
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2

    fm = ERes2NetV2()
    shapes = variables_shape_tree(fm, np.zeros((1, 64, 80), np.float32))
    n = sum(x.size for x in jax.tree_util.tree_leaves(shapes["params"]))
    assert abs(n / 1e6 - 17.86) < 0.15  # reference self-report: 17.86M
