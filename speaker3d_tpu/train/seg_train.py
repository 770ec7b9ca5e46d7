"""Segmentation training: one jit-compiled shard_map step (Adam + PIT BCE).

New capability vs the reference (whose overlap detection is a frozen
pyannote download; see models/segmentation.py). Follows the house pattern
(train/vad_train.py): fbank frontend, LR schedule, forward, permutation-
invariant frame BCE over [B, T, K] activations, backward, gradient psum over
the 'data' mesh axis, Adam — all traced into one XLA executable; batches
carry raw wav windows sharded on the batch axis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speaker3d_tpu.models.segmentation import pit_bce
from speaker3d_tpu.train.schedulers import warmup_cosine_lr


class SegTrainConfig(NamedTuple):
    min_lr: float = 1e-5
    max_lr: float = 1e-3
    warmup_epoch: int = 1
    fix_epoch: int = 10
    step_per_epoch: int = 1000
    weight_decay: float = 1e-5
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8


def init_seg_train_state(rng, model, example_feats, mesh: Mesh):
    variables = model.init(rng, example_feats, train=True)
    params = variables["params"]
    state = {
        "params": params,
        "adam_m": jax.tree_util.tree_map(jnp.zeros_like, params),
        "adam_v": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    rep = NamedSharding(mesh, P())
    return jax.device_put(state, jax.tree_util.tree_map(lambda _: rep, state))


def make_seg_train_step(model, cfg: SegTrainConfig, mesh: Mesh,
                        state_example,
                        feature_fn: Optional[Callable] = None) -> Callable:
    """Batches: {'wavs': [B, L] f32 (or 'feats' [B, T, F]),
    'labels': [B, T, K] int32 per-frame per-channel activity targets}."""
    n_data = mesh.shape["data"]
    batch_key = "wavs" if feature_fn is not None else "feats"
    batch_specs = {batch_key: P("data"), "labels": P("data")}

    def shard_body(state, batch):
        x, labels = batch[batch_key], batch["labels"].astype(jnp.float32)
        if feature_fn is not None:
            x = feature_fn(x)
        global_b = x.shape[0] * n_data

        lr = warmup_cosine_lr(
            state["step"], min_lr=cfg.min_lr, max_lr=cfg.max_lr,
            warmup_epoch=cfg.warmup_epoch, fix_epoch=cfg.fix_epoch,
            step_per_epoch=cfg.step_per_epoch)

        def loss_fn(params):
            logits = model.apply({"params": params}, x, train=True)
            per_ex, assignment = pit_bce(logits, labels)
            loss = jnp.sum(per_ex) / global_b
            # permutation-aligned frame accuracy
            aligned = jnp.take_along_axis(labels, assignment[:, None, :],
                                          axis=-1)
            acc = jnp.sum(jnp.mean(
                ((logits > 0) == (aligned > 0.5)).astype(jnp.float32),
                axis=(1, 2))) / global_b
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        grads = jax.lax.psum(grads, "data")
        loss = jax.lax.psum(loss, "data")
        acc = jax.lax.psum(acc, "data")

        step = state["step"] + 1
        t = step.astype(jnp.float32)
        bc1 = 1.0 - cfg.beta1 ** t
        bc2 = 1.0 - cfg.beta2 ** t

        def adam(p, g, m, v):
            g = g + cfg.weight_decay * p
            m = cfg.beta1 * m + (1 - cfg.beta1) * g
            v = cfg.beta2 * v + (1 - cfg.beta2) * g * g
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps)
            return p - lr * upd, m, v

        flat_p, treedef = jax.tree_util.tree_flatten(state["params"])
        flat_g = jax.tree_util.tree_leaves(grads)
        flat_m = jax.tree_util.tree_leaves(state["adam_m"])
        flat_v = jax.tree_util.tree_leaves(state["adam_v"])
        upd = [adam(p, g, m, v)
               for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        new_state = {
            "params": jax.tree_util.tree_unflatten(treedef, [u[0] for u in upd]),
            "adam_m": jax.tree_util.tree_unflatten(treedef, [u[1] for u in upd]),
            "adam_v": jax.tree_util.tree_unflatten(treedef, [u[2] for u in upd]),
            "step": step,
        }
        return new_state, {"loss": loss, "acc": acc, "lr": lr}

    rep = jax.tree_util.tree_map(lambda _: P(), state_example)
    shard_fn = jax.shard_map(shard_body, mesh=mesh,
                             in_specs=(rep, batch_specs),
                             out_specs=(rep, P()), check_vma=False)
    return jax.jit(shard_fn, donate_argnums=(0,))
