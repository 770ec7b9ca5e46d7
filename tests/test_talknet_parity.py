"""Parity: Flax TalkNet vs the reference torch model, weight-for-weight."""

import sys

import numpy as np
import pytest

from tests.conftest import has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")

sys.path.insert(0, "/root/reference")


def test_talknet_parity():
    import jax
    import torch
    from speakerlab.models.talknet.talknet import talkNetModel

    from speaker3d_tpu.compat import load_into_model
    from speaker3d_tpu.models.talknet import TalkNetModel

    torch.manual_seed(0)
    tm = talkNetModel()
    tm.eval()

    rng = np.random.default_rng(0)
    T = 8
    audio = rng.standard_normal((1, 4 * T, 13)).astype(np.float32)
    faces = (rng.random((1, T, 112, 112)) * 255).astype(np.float32)

    with torch.no_grad():
        w_av, w_a, w_v = tm(torch.from_numpy(audio), torch.from_numpy(faces))

    fm = TalkNetModel()
    variables = load_into_model(fm, tm.state_dict(), audio[:1], faces[:1])
    g_av, g_a, g_v = jax.jit(fm.apply)(variables, audio, faces)

    # reference reshapes scores to [B*T, 2] downstream; compare raw [B, T, 2]
    np.testing.assert_allclose(np.asarray(g_a), w_a.numpy().reshape(1, T, 2),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(g_v), w_v.numpy().reshape(1, T, 2),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(g_av), w_av.numpy().reshape(1, T, 2),
                               atol=2e-3, rtol=1e-2)
