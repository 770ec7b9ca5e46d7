"""Data-parallel embedding extraction == single-device extraction."""

import jax
import numpy as np
import pytest

from speaker3d_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_embedding_matches_single_device():
    from speaker3d_tpu.eval.embedding import (
        build_embedding_fn,
        build_sharded_embedding_fn,
    )
    from speaker3d_tpu.models.xvector import Xvector

    model = Xvector(feat_dim=80, hid_dim=16, stats_dim=32, embed_dim=16)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((16, 8000)) * 0.1).astype(np.float32)

    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    np.asarray(fbank(wavs[:1])))

    single = build_embedding_fn(model, variables, precision="highest")
    mesh = make_mesh(8, 1)
    sharded = build_sharded_embedding_fn(model, variables, mesh,
                                         precision="highest")
    a = np.asarray(single(wavs))
    b = np.asarray(sharded(wavs))
    np.testing.assert_allclose(a, b, atol=1e-5)
