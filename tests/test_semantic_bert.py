"""Semantic-speaker BERT: tiny-config training on both tasks learns."""

import jax
import numpy as np
import pytest

from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.semantic.bert import (
    SemanticTrainConfig,
    build_model,
    classification_metrics,
    init_semantic_state,
    make_semantic_train_step,
)


def _tiny(task):
    return build_model(task, num_labels=2, vocab_size=50, hidden_size=32,
                       num_hidden_layers=2, num_attention_heads=2)


def _batch(rng, token_level, b=8, L=16):
    # class-indicative tokens: label-1 sequences are dominated by token 7
    labels_seq = rng.integers(0, 2, b).astype(np.int32)
    ids = rng.integers(10, 50, (b, L)).astype(np.int32)
    for i, y in enumerate(labels_seq):
        if y:
            ids[i, : L // 2] = 7
    mask = np.ones((b, L), np.int32)
    if token_level:
        labels = np.where(ids == 7, 1, 0).astype(np.int32)
        labels[:, -2:] = -100  # ignore tail
    else:
        labels = labels_seq
    return {"input_ids": ids, "attention_mask": mask, "labels": labels}


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
@pytest.mark.parametrize("task,token_level", [("sequence", False),
                                              ("token", True)])
def test_semantic_training_learns(task, token_level):
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    model = _tiny(task)
    cfg = SemanticTrainConfig(lr=5e-3, total_steps=100)
    state = init_semantic_state(model, mesh)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_semantic_train_step(model, cfg, mesh, host["params"],
                                    token_level)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(25):
        batch = _batch(rng, token_level)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    m = classification_metrics(batch["labels"], np.asarray(metrics["preds"]))
    assert m["accuracy"] > 0.8, m
