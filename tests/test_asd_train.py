"""ASD train-step smoke test on a tiny audio-visual model."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.train.asd_train import (
    ASDTrainConfig,
    init_asd_train_state,
    make_asd_train_step,
)


class TinyAV(nn.Module):
    @nn.compact
    def __call__(self, audio, visual, train=False):
        # audio [B, 4T, F] -> [B, T, 8]
        a = nn.Dense(8)(audio)
        a = a.reshape(a.shape[0], a.shape[1] // 4, 4, 8).mean(axis=2)
        v = nn.Dense(8)(visual.reshape(*visual.shape[:2], -1))
        av = jnp.concatenate([a, v], axis=-1)
        return nn.Dense(2)(av), nn.Dense(2)(a), nn.Dense(2)(v)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_asd_training_learns():
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    cfg = ASDTrainConfig(lr=5e-3, step_per_epoch=10)
    rng = np.random.default_rng(0)
    B, T = 8, 6
    labels = rng.integers(0, 2, (B, T)).astype(np.int32)
    audio = rng.standard_normal((B, 4 * T, 13)).astype(np.float32) * 0.1
    audio += np.repeat(labels, 4, axis=1)[..., None] * 1.5
    visual = rng.standard_normal((B, T, 8, 8)).astype(np.float32) * 0.1
    visual += labels[..., None, None] * 1.5
    batch = {"audio": audio, "visual": visual, "labels": labels}

    model = TinyAV()
    state = init_asd_train_state(jax.random.PRNGKey(0), model, audio[:1],
                                 visual[:1], cfg, mesh)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_asd_train_step(model, cfg, mesh, host)

    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # mAP on the training batch should be near-perfect
    from speaker3d_tpu.utils.metrics import average_precision

    scores = np.asarray(metrics["scores"]).reshape(-1)
    ap = average_precision(labels.reshape(-1), scores)
    assert ap > 0.9, ap
