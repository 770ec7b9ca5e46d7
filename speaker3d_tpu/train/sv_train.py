"""Supervised SV training: one jit-compiled shard_map train step.

Behavioral contract (reference: speakerlab/bin/train.py hot loop :134-166):
per step — LR + margin schedules, forward (backbone -> cosine classifier),
AAM-softmax, backward, gradient all-reduce, SGD(momentum .9, nesterov,
wd 1e-4) update. The reference does this as host-side Python around DDP;
here the ENTIRE step (schedules included, as pure functions of the step
counter) compiles into a single XLA executable over a ('data', 'model') mesh:

  - batch sharded over ``data``; gradients psum over ``data``;
  - classifier weight [num_classes, emb] sharded over ``model``
    (vocab-parallel AAM via cross-shard psum — see train/losses.py);
  - backbone params/batch-stats replicated; backbone grads psum over both
    axes (each model shard contributes its class-slice partial);
  - BatchNorm uses local-batch statistics (torch-DDP semantics) while the
    running stats are pmean'd so replicas stay bit-identical.

SGD matches torch exactly: grad += wd * param; buf = m * buf + grad;
update = grad + m * buf (nesterov).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speaker3d_tpu.train.losses import sharded_arc_margin_loss
from speaker3d_tpu.train.schedulers import margin_at_step, warmup_cosine_lr


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class SVTrainConfig(NamedTuple):
    num_classes: int
    embedding_size: int = 192
    # optimizer (reference: conf eres2netv2.yaml SGD block)
    momentum: float = 0.9
    nesterov: bool = True
    weight_decay: float = 1e-4
    # lr schedule (reference: WarmupCosineScheduler)
    min_lr: float = 1e-4
    max_lr: float = 0.2
    warmup_epoch: int = 5
    fix_epoch: int = 70
    step_per_epoch: int = 1000
    # margin schedule (reference: MarginScheduler 0 -> 0.3, epochs 20-50)
    initial_margin: float = 0.0
    final_margin: float = 0.3
    increase_start_epoch: int = 20
    margin_fix_epoch: int = 50
    increase_type: str = "exp"
    # loss
    scale: float = 32.0
    easy_margin: bool = False
    # memory: rematerialize the backbone forward in the backward pass.
    # Models exposing a `remat` field (e.g. ERes2NetV2) get PER-BLOCK
    # rematerialization — the backward recomputes one residual block at a
    # time, so peak HBM holds only block boundaries (this is what actually
    # reduces peak; a whole-backbone jax.checkpoint re-materializes the
    # full forward live during the backward and saves almost nothing —
    # measured in docs/BENCH.md). Other models fall back to the
    # whole-backbone jax.checkpoint.
    remat: bool = False
    # mixed precision: run the backbone fwd/bwd in bfloat16 (master params,
    # classifier, loss and optimizer stay float32)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"


def _padded_classes(num_classes: int, n_model: int) -> int:
    return -(-num_classes // n_model) * n_model


def init_sv_train_state(rng, model, example_feats, cfg: SVTrainConfig,
                        mesh: Mesh, backbone_variables: Optional[Dict] = None):
    """Build the (sharded) train state as global arrays on the mesh."""
    if backbone_variables is None:
        backbone_variables = model.init(rng, example_feats, train=True)
    params = backbone_variables["params"]
    batch_stats = backbone_variables.get("batch_stats", {})

    c_pad = _padded_classes(cfg.num_classes, mesh.shape["model"])
    w_key = jax.random.fold_in(rng, 1)
    # xavier uniform over the true [num_classes, emb] fan
    limit = float(np.sqrt(6.0 / (cfg.num_classes + cfg.embedding_size)))
    cls_w = jax.random.uniform(w_key, (c_pad, cfg.embedding_size),
                               jnp.float32, -limit, limit)

    state = {
        "params": params,
        "batch_stats": batch_stats,
        "cls_w": cls_w,
        "momentum": {
            "params": jax.tree_util.tree_map(jnp.zeros_like, params),
            "cls_w": jnp.zeros_like(cls_w),
        },
        "step": jnp.zeros((), jnp.int32),
    }
    shardings = state_shardings(state, mesh)
    return jax.device_put(state, shardings)


def _spec_for_path(path_str: str, leaf) -> P:
    if "cls_w" in path_str and getattr(leaf, "ndim", 0) == 2:
        return P("model", None)
    return P()


def state_specs(state) -> Any:
    """PartitionSpec tree matching the train-state pytree."""
    def to_spec(path, leaf):
        path_str = "/".join(str(p) for p in path)
        return _spec_for_path(path_str, leaf)

    return jax.tree_util.tree_map_with_path(to_spec, state)


def state_shardings(state, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), state_specs(state),
        is_leaf=lambda x: isinstance(x, P))


def make_sv_train_step(model, cfg: SVTrainConfig, mesh: Mesh,
                       state_example, feature_fn: Optional[Callable] = None
                       ) -> Callable:
    """Compile the train step. ``state_example`` provides the state pytree
    structure for spec construction (can be the initial state).

    ``feature_fn``: optional on-device feature frontend (e.g. KaldiFbank);
    when given, batches carry raw ``wavs`` [B, L] and fbank fuses into the
    compiled step (sharded over the data axis with everything else)."""
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    c_pad = _padded_classes(cfg.num_classes, n_model)
    c_local = c_pad // n_model

    remat_whole = cfg.remat
    if cfg.remat:
        # per-block remat: same parameter paths, far lower peak HBM than a
        # whole-backbone jax.checkpoint (which saves ~nothing; docs/BENCH.md)
        for field in ("remat", "memory_efficient"):
            if hasattr(model, field):
                if getattr(model, field) is False:
                    model = model.clone(**{field: True})
                remat_whole = False
                break

    specs = state_specs(state_example)
    batch_key = "wavs" if feature_fn is not None else "feats"
    batch_specs = {batch_key: P("data"), "labels": P("data")}

    def shard_body(state, batch):
        feats, labels = batch[batch_key], batch["labels"]
        if feats.dtype == jnp.int16:
            # int16 wire format (BatchLoader wire_dtype): half the
            # host->device bytes; exact k/32768 reconstruction on device
            feats = feats.astype(jnp.float32) * (1.0 / 32768.0)
        if feature_fn is not None:
            feats = feature_fn(feats)
        local_b = feats.shape[0]
        global_b = local_b * n_data

        lr = warmup_cosine_lr(
            state["step"], min_lr=cfg.min_lr, max_lr=cfg.max_lr,
            warmup_epoch=cfg.warmup_epoch, fix_epoch=cfg.fix_epoch,
            step_per_epoch=cfg.step_per_epoch)
        margin = margin_at_step(
            state["step"], increase_start_epoch=cfg.increase_start_epoch,
            fix_epoch=cfg.margin_fix_epoch, step_per_epoch=cfg.step_per_epoch,
            initial_margin=cfg.initial_margin, final_margin=cfg.final_margin,
            increase_type=cfg.increase_type)
        offset = jax.lax.axis_index("model") * c_local

        half = cfg.compute_dtype == "bfloat16"

        def backbone_fwd(bb_params, feats):
            import contextlib

            from speaker3d_tpu.models.common import bn_compute_dtype

            ctx = contextlib.nullcontext()
            if half:
                bb_params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, bb_params)
                feats = feats.astype(jnp.bfloat16)
                # BN normalization/output in bf16 (stats still accumulate
                # f32): without this, flax BN promotes through the f32
                # running stats and the normalize pass runs in f32
                ctx = bn_compute_dtype(jnp.bfloat16)
            with ctx:
                out, mutated = model.apply(
                    {"params": bb_params,
                     "batch_stats": state["batch_stats"]},
                    feats, train=True, mutable=["batch_stats"])
            if half:
                out = out.astype(jnp.float32)
                mutated = {"batch_stats": jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32),
                    mutated["batch_stats"])}
            return out, mutated

        if remat_whole:
            backbone_fwd = jax.checkpoint(backbone_fwd)

        def loss_fn(trainable):
            bb_params, cls_w = trainable
            out, mutated = backbone_fwd(bb_params, feats)
            emb = out
            cos = _l2norm(emb) @ _l2norm(cls_w).T          # [B, c_local]
            # mask padded class columns so they never win or contribute
            col = offset + jax.lax.broadcasted_iota(jnp.int32, (1, c_local), 1)
            cos = jnp.where(col < cfg.num_classes, cos, -1.0)
            ce = sharded_arc_margin_loss(
                cos, labels, offset, margin, cfg.scale, cfg.easy_margin)
            # Each model-axis member computes the SAME global CE; divide by
            # n_model so that, under shard_map AD (psum transposes to psum of
            # cotangents across members), the summed cotangents reconstruct
            # exactly the true partials instead of n_model-times them.
            loss = jnp.sum(ce) / (global_b * n_model)
            # train top-1 (approx via target-vs-max cosine)
            local_max = jax.lax.stop_gradient(jnp.max(cos, axis=-1))
            global_max = jax.lax.pmax(local_max, "model")
            local_lab = labels - offset
            owned = (local_lab >= 0) & (local_lab < c_local)
            tgt_local = jnp.where(
                owned,
                jnp.take_along_axis(cos, jnp.where(owned, local_lab, 0)[:, None],
                                    axis=1)[:, 0], 0.0)
            tgt = jax.lax.psum(tgt_local, "model")
            acc = jnp.sum((tgt >= global_max - 1e-7)) / global_b
            return loss, (mutated["batch_stats"], acc)

        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)((state["params"], state["cls_w"]))

        g_bb = jax.lax.psum(grads[0], ("data", "model"))
        g_w = jax.lax.psum(grads[1], "data")
        loss = jax.lax.psum(loss, ("data", "model"))
        acc = jax.lax.psum(acc, "data")
        new_bs = jax.lax.pmean(new_bs, ("data", "model"))

        def sgd(p, g, buf):
            g = g + cfg.weight_decay * p
            buf = cfg.momentum * buf + g
            d = g + cfg.momentum * buf if cfg.nesterov else buf
            return p - lr * d, buf

        flat_p, treedef = jax.tree_util.tree_flatten(state["params"])
        flat_g = jax.tree_util.tree_leaves(g_bb)
        flat_b = jax.tree_util.tree_leaves(state["momentum"]["params"])
        upd = [sgd(p, g, b) for p, g, b in zip(flat_p, flat_g, flat_b)]
        new_params = jax.tree_util.tree_unflatten(treedef, [u[0] for u in upd])
        new_mom_p = jax.tree_util.tree_unflatten(treedef, [u[1] for u in upd])
        new_w, new_mom_w = sgd(state["cls_w"], g_w, state["momentum"]["cls_w"])

        new_state = {
            "params": new_params,
            "batch_stats": new_bs,
            "cls_w": new_w,
            "momentum": {"params": new_mom_p, "cls_w": new_mom_w},
            "step": state["step"] + 1,
        }
        metrics = {"loss": loss, "acc": acc, "lr": lr, "margin": margin}
        return new_state, metrics

    shard_fn = jax.shard_map(
        shard_body, mesh=mesh, in_specs=(specs, batch_specs),
        out_specs=(specs, P()), check_vma=False)
    return jax.jit(shard_fn, donate_argnums=(0,))
