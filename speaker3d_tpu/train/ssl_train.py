"""Self-supervised (RDINO / SDPN) training: jit-compiled shard_map steps with
an EMA teacher.

Behavioral contract (reference: speakerlab/bin/train_rdino.py,
bin/train_sdpn.py, utils/utils_rdino.py): student/teacher with identical
architecture, SyncBN, cosine schedules for lr / weight-decay / teacher
momentum, per-parameter gradient clipping, last-layer freeze for the first
epochs, SGD momentum 0.9 with weight decay applied only to >=2-dim params,
teacher EMA after every step; SDPN adds learnable prototypes (separate lr,
all-reduced grads, no wd) + distributed Sinkhorn targets + KoLeo.

TPU-native: one compiled step over the 'data' mesh axis; schedules are pure
functions of the traced step counter; SyncBN via BatchNorm(axis_name='data');
cross-replica terms (DINO centering, sinkhorn, ME-MAX, VICReg gather) use
psum/all_gather inside shard_map.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speaker3d_tpu.models.common import sync_batchnorm
from speaker3d_tpu.train import ssl_losses


def ssl_cosine_schedule(step, *, base_value, final_value, total_steps,
                        warmup_steps=0, start_warmup_value=0.0):
    """(reference: utils/utils_rdino.py:120-131 cosine_scheduler)"""
    step = jnp.asarray(step, jnp.float32)
    warm = start_warmup_value + (base_value - start_warmup_value) * (
        step / jnp.maximum(warmup_steps, 1))
    i = step - warmup_steps
    n = jnp.maximum(total_steps - warmup_steps, 1)
    cos = final_value + 0.5 * (base_value - final_value) * (
        1 + jnp.cos(jnp.pi * i / n))
    return jnp.where(step < warmup_steps, warm, cos)


class SSLTrainConfig(NamedTuple):
    # schedules (reference: train_rdino.py:86-110)
    base_lr: float = 0.2           # already scaled by global batch / 256
    min_lr: float = 1e-5
    epochs: int = 150
    step_per_epoch: int = 1000
    warmup_epochs: int = 10
    weight_decay: float = 1e-4
    weight_decay_end: float = 1e-4
    momentum_teacher: float = 0.996
    sgd_momentum: float = 0.9
    clip_grad: float = 3.0
    freeze_last_layer: int = 1     # epochs
    # dino
    ncrops: int = 6                # 2 global + 4 local (RDINO)
    out_dim: int = 65536
    warmup_teacher_temp: float = 0.04
    teacher_temp: float = 0.07
    warmup_teacher_temp_epochs: int = 30
    student_temp: float = 0.1
    center_momentum: float = 0.9
    reg_std_coeff: float = 5.0
    reg_cov_coeff: float = 1.0
    reg_weight: float = 1.0
    # sdpn
    num_proto: int = 1024
    output_dim: int = 256
    proto_lr: float = 0.2
    tau: float = 0.1
    sharpen_T: float = 0.25
    num_local_views: int = 4
    memax_weight: float = 1.0
    koleo_weight: float = 0.1
    use_sinkhorn: bool = True


def _is_decayed(path_str: str, leaf) -> bool:
    """wd only for >=2-dim non-bias params (utils_rdino.get_params_groups)."""
    return getattr(leaf, "ndim", 0) >= 2 and not path_str.endswith("bias")


def _tree_update_sgd(params, grads, momentum_buf, *, lr, wd, sgd_momentum,
                     clip, freeze_last, step_freeze_mask):
    """Per-parameter clip + last-layer freeze + torch-style SGD momentum."""
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_b = jax.tree_util.tree_leaves(momentum_buf)

    new_p, new_b = [], []
    for (path, p), g, b in zip(flat_p, flat_g, flat_b):
        path_str = "/".join(str(k) for k in path)
        if clip is not None and clip > 0:
            norm = jnp.linalg.norm(g)
            g = g * jnp.minimum(1.0, clip / (norm + 1e-6))
        if freeze_last and "last_layer" in path_str:
            g = g * step_freeze_mask  # 0 while frozen
        if _is_decayed(path_str, p):
            g = g + wd * p
        b = sgd_momentum * b + g
        new_p.append(p - lr * b)
        new_b.append(b)
    return (jax.tree_util.tree_unflatten(treedef, new_p),
            jax.tree_util.tree_unflatten(treedef, new_b))


def _ema(teacher, student, m):
    return jax.tree_util.tree_map(lambda t, s: t * m + (1 - m) * s,
                                  teacher, student)


def _replicated_specs(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)



def _crop_major(x, feature_fn):
    """[B_local, G, ...] -> crop-major [G*B_local, T, F], computing features
    per crop. Batches are SAMPLE-major globally (so sharding the batch axis
    over 'data' keeps every crop of a sample on one shard) and transposed to
    the reference's crop-major layout locally."""
    b, g = x.shape[0], x.shape[1]
    x = x.reshape((b * g,) + x.shape[2:])
    if feature_fn is not None:
        x = feature_fn(x)
    x = x.reshape((b, g) + x.shape[1:])
    x = jnp.swapaxes(x, 0, 1)
    return x.reshape((g * b,) + x.shape[2:])

def init_ssl_state(rng, model, example_global, cfg: SSLTrainConfig,
                   mesh: Mesh, variant: str = "rdino"):
    """Student/teacher start from the same weights (train_rdino.py:69-70)."""
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, example_global, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = {
        "student": {"params": params, "batch_stats": batch_stats},
        "teacher": {"params": jax.tree_util.tree_map(jnp.copy, params),
                    "batch_stats": jax.tree_util.tree_map(jnp.copy, batch_stats)},
        "momentum": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    if variant == "rdino":
        state["center"] = jnp.zeros((1, cfg.out_dim), jnp.float32)
    else:
        k = (1.0 / cfg.output_dim) ** 0.5
        state["prototypes"] = jax.random.uniform(
            jax.random.fold_in(rng, 7), (cfg.num_proto, cfg.output_dim),
            jnp.float32, -k, k)
        state["proto_momentum"] = jnp.zeros_like(state["prototypes"])
    shardings = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), state)
    return jax.device_put(state, shardings)


def make_rdino_train_step(model, cfg: SSLTrainConfig, mesh: Mesh,
                          state_example,
                          feature_fn: Optional[Callable] = None) -> Callable:
    """model: RDINOCombiner (returns (reg_out, dino_out))."""
    total_steps = cfg.epochs * cfg.step_per_epoch
    specs = _replicated_specs(state_example)
    key = "wavs" if feature_fn is not None else "feats"
    batch_specs = {f"global_{key}": P("data"), f"local_{key}": P("data")}

    def shard_body(state, batch):
        g_in = _crop_major(batch[f"global_{key}"], feature_fn)
        l_in = _crop_major(batch[f"local_{key}"], feature_fn)
        step = state["step"]
        lr = ssl_cosine_schedule(step, base_value=cfg.base_lr,
                                 final_value=cfg.min_lr,
                                 total_steps=total_steps,
                                 warmup_steps=cfg.warmup_epochs
                                 * cfg.step_per_epoch)
        wd = ssl_cosine_schedule(step, base_value=cfg.weight_decay,
                                 final_value=cfg.weight_decay_end,
                                 total_steps=total_steps)
        m_teacher = ssl_cosine_schedule(step, base_value=cfg.momentum_teacher,
                                        final_value=1.0,
                                        total_steps=total_steps)
        epoch_f = step.astype(jnp.float32) / cfg.step_per_epoch
        # teacher temp: linspace warmup->teacher_temp over warmup epochs
        # (reference: loss/dino_loss.py:30-31)
        w_steps = cfg.warmup_teacher_temp_epochs * cfg.step_per_epoch
        t_temp = jnp.where(
            step < w_steps,
            cfg.warmup_teacher_temp + (cfg.teacher_temp
                                       - cfg.warmup_teacher_temp)
            * step.astype(jnp.float32) / jnp.maximum(w_steps, 1),
            cfg.teacher_temp)

        # teacher forward (no grad) on globals
        with sync_batchnorm("data"):
            (tea_reg, tea_out), tea_mut = model.apply(
                state["teacher"], g_in, train=True, mutable=["batch_stats"])
        tea_reg = jax.lax.stop_gradient(tea_reg)
        tea_out = jax.lax.stop_gradient(tea_out)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state["student"]["batch_stats"]}
            with sync_batchnorm("data"):
                (s_reg_g, s_out_g), mut1 = model.apply(
                    variables, g_in, train=True, mutable=["batch_stats"])
                variables2 = {"params": params,
                              "batch_stats": mut1["batch_stats"]}
                (_, s_out_l), mut2 = model.apply(
                    variables2, l_in, train=True, mutable=["batch_stats"])
            student_out = jnp.concatenate([s_out_g, s_out_l], axis=0)
            dloss, new_center = ssl_losses.dino_loss(
                student_out, tea_out, state["center"], ncrops=cfg.ncrops,
                teacher_temp=t_temp, student_temp=cfg.student_temp,
                center_momentum=cfg.center_momentum, axis_name="data")
            rloss = ssl_losses.reg_loss(
                tea_reg, s_reg_g, std_coeff=cfg.reg_std_coeff,
                cov_coeff=cfg.reg_cov_coeff, axis_name="data")
            loss = dloss + cfg.reg_weight * rloss
            return loss, (new_center, mut2["batch_stats"], dloss, rloss)

        (loss, (new_center, new_bs, dloss, rloss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["student"]["params"])
        grads = jax.lax.pmean(grads, "data")

        freeze_mask = (epoch_f >= cfg.freeze_last_layer).astype(jnp.float32)
        new_params, new_mom = _tree_update_sgd(
            state["student"]["params"], grads, state["momentum"],
            lr=lr, wd=wd, sgd_momentum=cfg.sgd_momentum, clip=cfg.clip_grad,
            freeze_last=True, step_freeze_mask=freeze_mask)

        new_teacher_params = _ema(state["teacher"]["params"], new_params,
                                  m_teacher)
        new_state = {
            "student": {"params": new_params, "batch_stats": new_bs},
            "teacher": {"params": new_teacher_params,
                        "batch_stats": tea_mut["batch_stats"]},
            "momentum": new_mom,
            "center": new_center,
            "step": step + 1,
        }
        metrics = {"loss": jax.lax.pmean(loss, "data"),
                   "dino_loss": jax.lax.pmean(dloss, "data"),
                   "reg_loss": jax.lax.pmean(rloss, "data"),
                   "lr": lr, "teacher_momentum": m_teacher}
        return new_state, metrics

    fn = jax.shard_map(shard_body, mesh=mesh, in_specs=(specs, batch_specs),
                       out_specs=(specs, P()), check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def make_sdpn_train_step(model, cfg: SSLTrainConfig, mesh: Mesh,
                         state_example,
                         feature_fn: Optional[Callable] = None) -> Callable:
    """model: SDPNCombiner (returns (backbone_emb, head_out)).

    Batch: clean globals (teacher) + augmented local crops (student anchors).
    (reference: bin/train_sdpn.py:170-235)
    """
    total_steps = cfg.epochs * cfg.step_per_epoch
    specs = _replicated_specs(state_example)
    key = "wavs" if feature_fn is not None else "feats"
    batch_specs = {f"global_{key}": P("data"), f"local_{key}": P("data")}
    proto_labels = jnp.eye(cfg.num_proto, dtype=jnp.float32)

    def shard_body(state, batch):
        g_in = _crop_major(batch[f"global_{key}"], feature_fn)
        l_in = _crop_major(batch[f"local_{key}"], feature_fn)
        step = state["step"]
        lr = ssl_cosine_schedule(step, base_value=cfg.base_lr,
                                 final_value=cfg.min_lr,
                                 total_steps=total_steps,
                                 warmup_steps=cfg.warmup_epochs
                                 * cfg.step_per_epoch)
        wd = ssl_cosine_schedule(step, base_value=cfg.weight_decay,
                                 final_value=cfg.weight_decay_end,
                                 total_steps=total_steps)
        m_teacher = ssl_cosine_schedule(step, base_value=cfg.momentum_teacher,
                                        final_value=1.0,
                                        total_steps=total_steps)
        epoch_f = step.astype(jnp.float32) / cfg.step_per_epoch

        with sync_batchnorm("data"):
            (_, target_views), tea_mut = model.apply(
                state["teacher"], g_in, train=True, mutable=["batch_stats"])
        target_views = jax.lax.stop_gradient(target_views)

        def loss_fn(trainable):
            params, prototypes = trainable
            variables = {"params": params,
                         "batch_stats": state["student"]["batch_stats"]}
            with sync_batchnorm("data"):
                (anchor_emb, anchor_views), mut = model.apply(
                    variables, l_in, train=True, mutable=["batch_stats"])
            ploss, memax, _ = ssl_losses.sdpn_loss(
                anchor_views, target_views, prototypes, proto_labels,
                tau=cfg.tau, T=cfg.sharpen_T, num_views=cfg.num_local_views,
                use_sinkhorn=cfg.use_sinkhorn, axis_name="data")
            chunks = anchor_emb.reshape(cfg.num_local_views, -1,
                                        anchor_emb.shape[-1])
            ke = sum(ssl_losses.koleo_loss(chunks[i])
                     for i in range(cfg.num_local_views))
            loss = ploss + cfg.memax_weight * memax + cfg.koleo_weight * ke
            return loss, (mut["batch_stats"], ploss, memax, ke)

        (loss, (new_bs, ploss, memax, ke)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
                (state["student"]["params"], state["prototypes"]))
        g_params = jax.lax.pmean(grads[0], "data")
        # prototypes grads all-reduce-SUMMED (train_sdpn.py:224): with W-way
        # data parallelism the prototype gradient is W x the single-process
        # global-batch gradient — the reference's linear-scaling behavior,
        # kept deliberately (pinned by the N=1 proto_lr*N equivalence test).
        g_proto = jax.lax.psum(grads[1], "data")

        freeze_mask = (epoch_f >= cfg.freeze_last_layer).astype(jnp.float32)
        new_params, new_mom = _tree_update_sgd(
            state["student"]["params"], g_params, state["momentum"],
            lr=lr, wd=wd, sgd_momentum=cfg.sgd_momentum, clip=cfg.clip_grad,
            freeze_last=True, step_freeze_mask=freeze_mask)
        # prototypes: separate group — no wd, own lr, same momentum
        proto_lr = ssl_cosine_schedule(step, base_value=cfg.proto_lr,
                                       final_value=cfg.min_lr,
                                       total_steps=total_steps,
                                       warmup_steps=cfg.warmup_epochs
                                       * cfg.step_per_epoch)
        new_pm = cfg.sgd_momentum * state["proto_momentum"] + g_proto
        new_proto = state["prototypes"] - proto_lr * new_pm

        new_teacher_params = _ema(state["teacher"]["params"], new_params,
                                  m_teacher)
        new_state = {
            "student": {"params": new_params, "batch_stats": new_bs},
            "teacher": {"params": new_teacher_params,
                        "batch_stats": tea_mut["batch_stats"]},
            "momentum": new_mom,
            "prototypes": new_proto,
            "proto_momentum": new_pm,
            "step": step + 1,
        }
        metrics = {"loss": jax.lax.pmean(loss, "data"),
                   "ploss": jax.lax.pmean(ploss, "data"),
                   "memax": jax.lax.pmean(memax, "data"),
                   "koleo": jax.lax.pmean(ke, "data"),
                   "lr": lr}
        return new_state, metrics

    fn = jax.shard_map(shard_body, mesh=mesh, in_specs=(specs, batch_specs),
                       out_specs=(specs, P()), check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))
