"""TalkNet active-speaker-detection trainer CLI.

Behavioral contract (reference: speakerlab/bin/train_asd.py): train over
length-sorted AVA mini-batches with loss CE(AV) + 0.4 CE(A) + 0.4 CE(V),
Adam with per-epoch LR decay, periodic evaluation reporting mAP
(:178-240); `--test` runs evaluation only.

Usage:
  python -m speaker3d_tpu.cli.train_asd --train_csv train.csv \
      --val_csv val.csv --audio_dir ... --video_dir ... --exp_dir exp/asd
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def evaluate(model, variables, val_data, limit=None):
    import jax

    from speaker3d_tpu.utils.metrics import average_precision

    @jax.jit
    def forward(audio, visual):
        av, _, _ = model.apply(variables, audio, visual)
        return jax.nn.softmax(av, axis=-1)[..., 1]

    scores, labels = [], []
    n = len(val_data) if limit is None else min(limit, len(val_data))
    for i in range(n):
        a, v, y = val_data[i]
        s = np.asarray(forward(a.astype(np.float32), v.astype(np.float32)))
        scores.append(s.reshape(-1))
        labels.append(np.asarray(y).reshape(-1))
    return average_precision(np.concatenate(labels), np.concatenate(scores))


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.data.dataset_asd import TrainData, ValData
    from speaker3d_tpu.models.talknet import TalkNetModel
    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.asd_train import (
        ASDTrainConfig,
        init_asd_train_state,
        make_asd_train_step,
    )
    from speaker3d_tpu.utils.checkpoint import Checkpointer

    p = argparse.ArgumentParser()
    p.add_argument("--train_csv", required=True)
    p.add_argument("--val_csv", required=True)
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--video_dir", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--batch_size", type=int, default=500,
                   help="frames per mini-batch (length-sorted batching)")
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_decay", type=float, default=0.95)
    p.add_argument("--test", action="store_true")
    p.add_argument("--profile_dir", default=None,
                   help="write a TensorBoard trace of a window of "
                        "train steps (utils/profiling.py)")
    p.add_argument("--profile_steps", type=int, default=5)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)
    from speaker3d_tpu.utils.misc import set_seed
    set_seed(args.seed)  # reference: bin/train_asd.py seeds the RNGs
    os.makedirs(args.exp_dir, exist_ok=True)

    model = TalkNetModel()
    val_data = ValData(args.val_csv, args.audio_dir, args.video_dir)
    ckpt = Checkpointer(os.path.join(args.exp_dir, "models"))

    if args.test:
        states = ckpt.recover_if_possible()
        variables = {"params": states["asd_state"]["params"],
                     "batch_stats": states["asd_state"]["batch_stats"]}
        m_ap = evaluate(model, variables, val_data)
        print(f"mAP: {100 * m_ap:.2f}%")
        return

    train_data = TrainData(args.train_csv, args.audio_dir, args.video_dir,
                           args.batch_size)
    cfg = ASDTrainConfig(lr=args.lr, lr_decay=args.lr_decay,
                         step_per_epoch=max(len(train_data), 1))
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    a0, v0, _ = train_data[0]
    state = init_asd_train_state(jax.random.PRNGKey(0), model,
                                 a0[:1].astype(np.float32),
                                 v0[:1].astype(np.float32), cfg, mesh)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    # NOTE: length-sorted batches have VARIABLE shapes; each distinct
    # (frames,) shape compiles once and is reused (AVA has few lengths).
    step = make_asd_train_step(model, cfg, mesh, host)

    from speaker3d_tpu.utils.preemption import GracefulShutdown
    from speaker3d_tpu.utils.profiling import StepTracer

    shutdown = GracefulShutdown()
    preempted = False  # collective poll() decision; the raw local
    # flag can diverge across ranks (see preemption.finalize)
    tracer = StepTracer(args.profile_dir, num_steps=args.profile_steps)
    global_step = 0
    from speaker3d_tpu.data.prefetch import device_prefetch

    order = np.arange(len(train_data))

    def host_batches():
        for bi in order:
            a, v, y = train_data[int(bi)]
            yield {"audio": a.astype(np.float32),
                   "visual": v.astype(np.float32),
                   "labels": y.astype(np.int32)}

    for epoch in range(args.epochs):
        np.random.default_rng(epoch).shuffle(order)
        t0, losses = time.time(), []
        for batch in device_prefetch(host_batches(), mesh=mesh):
            tracer.before_step(global_step)
            state, metrics = step(state, batch)
            tracer.after_step(global_step, wait_for=metrics["loss"])
            global_step += 1
            # keep the device scalar; per-step float() would sync the pipe
            losses.append(metrics["loss"])
            if shutdown.poll():  # pod-aware: any rank's signal
                preempted = True  # stops ALL ranks at this boundary
                break
        if preempted:
            if jax.process_index() == 0:
                host = jax.tree_util.tree_map(np.asarray,
                                              jax.device_get(state))
                d = ckpt.save_checkpoint(epoch, {"asd_state": host})
                print(f"[preemption] checkpoint saved to {d}; exiting",
                      flush=True)
            break
        host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
        variables = {"params": host["params"],
                     "batch_stats": host["batch_stats"]}
        m_ap = evaluate(model, variables, val_data, limit=200)
        from speaker3d_tpu.utils.misc import fetch_mean

        avg_loss = fetch_mean(losses) if losses else float("nan")
        print(f"epoch {epoch+1}: loss {avg_loss:.4f} "
              f"val mAP {100*m_ap:.2f}% ({time.time()-t0:.0f}s)", flush=True)
        if jax.process_index() == 0:
            ckpt.save_checkpoint(epoch + 1, {"asd_state": host})
    tracer.close()
    shutdown.finalize(preempted)


if __name__ == "__main__":
    main()
