"""Face detector trainer (models/face_detector.py TinyFaceDetector).

New capability vs the reference, which downloads a version-RFB-320 ONNX
face detector (reference: egs/3dspeaker/speaker-diarization/
run_video.sh:47-52). Trains out of the box on rendered synthetic faces
(data/synthetic_faces.py); real annotations plug in via a JSONL of
{"image": path, "boxes": [[x, y, w, h], ...]} with --config key `data`.

The whole step (render -> targets on host; forward + focal-heatmap/L1-size
loss + Adam on device) runs as one shard_map'ed jit over the 'data' mesh.

Usage:
  python -m speaker3d_tpu.cli.train_face_detector --config configs/face_det.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from speaker3d_tpu.models.face_detector import (
    STRIDE,
    TinyFaceDetector,
    detector_loss,
    gaussian_heatmap,
)
from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.train.schedulers import warmup_cosine_lr
from speaker3d_tpu.utils.checkpoint import Checkpointer, EpochCounter, EpochLogger
from speaker3d_tpu.utils.config import build_config


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Train the tiny face detector")
    p.add_argument("--config", required=True)
    p.add_argument("--seed", type=int, default=1234)
    args, overrides = p.parse_known_args(argv)
    return args, overrides


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    args, overrides = get_args(argv)
    config = build_config(args.config, overrides,
                          copy_to_exp_dir=jax.process_index() == 0)
    exp_dir = config["exp_dir"]
    os.makedirs(exp_dir, exist_ok=True)

    height = config.get("height", 144)
    width = config.get("width", 192)
    batch_size = config.get("batch_size", 16)
    step_per_epoch = config.get("step_per_epoch", 20)
    num_epoch = config.get("num_epoch", 15)

    real_rows = []
    if config.get("data"):
        with open(config["data"]) as f:
            real_rows = [json.loads(line) for line in f if line.strip()]

    n_proc = jax.process_count()
    local_batch = max(batch_size // n_proc, 1)

    def make_batch(rng):
        frames = np.zeros((local_batch, height, width, 1), np.float32)
        gh, gw = height // STRIDE, width // STRIDE
        heat = np.zeros((local_batch, gh, gw), np.float32)
        size = np.zeros((local_batch, gh, gw, 2), np.float32)
        mask = np.zeros((local_batch, gh, gw), np.float32)
        for i in range(local_batch):
            if real_rows:
                row = real_rows[int(rng.integers(0, len(real_rows)))]
                import cv2

                img = cv2.imread(row["image"], cv2.IMREAD_GRAYSCALE)
                img = cv2.resize(img, (width, height))
                boxes = [tuple(b) for b in row["boxes"]]
            else:
                from speaker3d_tpu.data.synthetic_faces import render_frame

                img, boxes = render_frame(rng, height, width)
            frames[i, :, :, 0] = img.astype(np.float32) / 255.0
            heat[i], size[i], mask[i] = gaussian_heatmap(height, width,
                                                         boxes)
        return {"frames": frames, "heat": heat, "size": size, "mask": mask}

    n_local = len(jax.devices()) // n_proc
    import math

    from speaker3d_tpu.parallel.mesh import balanced_devices

    n_data = n_proc * math.gcd(local_batch, max(n_local, 1))
    mesh = make_mesh(data=n_data, model=1, devices=balanced_devices(n_data))

    model = TinyFaceDetector(**config.get("model", {}).get("args", {}))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(args.seed),
        np.zeros((1, height, width, 1), np.float32), train=True)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "adam_m": jax.tree_util.tree_map(jnp.zeros_like,
                                         variables["params"]),
        "adam_v": jax.tree_util.tree_map(jnp.zeros_like,
                                         variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    rep = NamedSharding(mesh, P())
    state = jax.device_put(state, jax.tree_util.tree_map(lambda _: rep,
                                                         state))

    cfg_lr = dict(min_lr=config.get("min_lr", 1e-5),
                  max_lr=config.get("max_lr", 2e-3),
                  warmup_epoch=config.get("warmup_epoch", 1),
                  fix_epoch=num_epoch, step_per_epoch=step_per_epoch)
    wd = config.get("weight_decay", 1e-6)
    batch_specs = {"frames": P("data"), "heat": P("data"),
                   "size": P("data"), "mask": P("data")}

    def shard_body(state, batch):
        lr = warmup_cosine_lr(state["step"], **cfg_lr)

        def loss_fn(params):
            (heat, sizes), mut = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                batch["frames"], train=True, mutable=["batch_stats"])
            loss, hl, sl = detector_loss(heat, sizes, batch["heat"],
                                         batch["size"], batch["mask"])
            return loss, (mut["batch_stats"], hl, sl)

        (loss, (new_bs, hl, sl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        new_bs = jax.lax.pmean(new_bs, "data")

        step = state["step"] + 1
        t = step.astype(jnp.float32)
        bc1 = 1.0 - 0.9 ** t
        bc2 = 1.0 - 0.999 ** t

        def adam(p, g, m, v):
            g = g + wd * p
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            return p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + 1e-8), m, v

        flat_p, treedef = jax.tree_util.tree_flatten(state["params"])
        upd = [adam(p, g, m, v) for p, g, m, v in zip(
            flat_p, jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(state["adam_m"]),
            jax.tree_util.tree_leaves(state["adam_v"]))]
        return ({"params": jax.tree_util.tree_unflatten(
                    treedef, [u[0] for u in upd]),
                 "batch_stats": new_bs,
                 "adam_m": jax.tree_util.tree_unflatten(
                    treedef, [u[1] for u in upd]),
                 "adam_v": jax.tree_util.tree_unflatten(
                    treedef, [u[2] for u in upd]),
                 "step": step},
                {"loss": loss, "heat_loss": jax.lax.pmean(hl, "data"),
                 "size_loss": jax.lax.pmean(sl, "data"), "lr": lr})

    spec_tree = jax.tree_util.tree_map(lambda _: P(), jax.device_get(state))
    step_fn = jax.jit(jax.shard_map(
        shard_body, mesh=mesh, in_specs=(spec_tree, batch_specs),
        out_specs=(spec_tree, P()), check_vma=False), donate_argnums=(0,))

    epoch_counter = EpochCounter(num_epoch)
    checkpointer = Checkpointer(os.path.join(exp_dir, "models"),
                                recoverables={"epoch_counter": epoch_counter})
    logger = EpochLogger(os.path.join(exp_dir, "train_epoch.log"))
    rng = np.random.default_rng(args.seed)

    from speaker3d_tpu.data.prefetch import device_prefetch
    for epoch in epoch_counter:
        t0 = time.time()
        losses = []
        gen = (make_batch(rng) for _ in range(step_per_epoch))
        for batch in device_prefetch(gen, mesh=mesh):
            state, metrics = step_fn(state, batch)
            losses.append(metrics["loss"])
        if jax.process_index() == 0:
            avg = float(np.mean([float(v) for v in losses]))
            logger.log_stats({"epoch": epoch,
                              "time_s": round(time.time() - t0, 1)},
                             {"avg_loss": avg})
            print(f"epoch {epoch} avg_loss {avg:.4f}", flush=True)
            host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
            checkpointer.save_checkpoint(epoch, {"train_state": host})


if __name__ == "__main__":
    main()
