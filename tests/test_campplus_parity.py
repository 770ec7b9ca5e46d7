"""Parity: Flax CAM++ vs the reference torch model, weight-for-weight."""

import numpy as np
import pytest

from tests.conftest import has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def test_campplus_parity():
    import sys
    sys.path.insert(0, "/root/reference")
    import jax
    import torch
    from speakerlab.models.campplus.DTDNN import CAMPPlus as TorchCAMPPlus

    from speaker3d_tpu.compat import load_into_model
    from speaker3d_tpu.models.campplus import CAMPPlus

    torch.manual_seed(0)
    tm = TorchCAMPPlus(feat_dim=80, embedding_size=512, memory_efficient=False)
    tm.eval()
    n_params = sum(p.numel() for p in tm.parameters())
    assert abs(n_params / 1e6 - 7.2) < 0.4  # reference self-report ~7.2M

    # T=230 exercises the ceil-mode segment pooling (230 = 2*100 + 30)
    x = np.random.default_rng(0).standard_normal((2, 230, 80)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    fm = CAMPPlus(feat_dim=80, embedding_size=512)
    variables = load_into_model(fm, tm.state_dict(), x[:1])
    out = np.asarray(jax.jit(fm.apply)(variables, x))

    assert out.shape == ref.shape == (2, 512)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
