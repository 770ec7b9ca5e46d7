"""Self-supervised (RDINO / SDPN) trainer CLI.

Behavioral contract (reference: speakerlab/bin/train_rdino.py,
bin/train_sdpn.py): multi-crop SSL training with EMA teacher; checkpoints
with student/teacher/prototypes; append-style JSON epoch logs.

Usage:
  python -m speaker3d_tpu.cli.train_ssl --config configs/rdino.yaml \
      [--variant rdino|sdpn] [--overrides...]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from speaker3d_tpu.data.dataset_ssl import (
    RDINODataset,
    SDPNDataset,
    SSLBatchLoader,
)
from speaker3d_tpu.models.ecapa_tdnn import ECAPA_TDNN
from speaker3d_tpu.models.ssl_heads import (
    RDINOCombiner,
    RDINOHead,
    SDPNCombiner,
    SDPNHead,
)
from speaker3d_tpu.ops.melspec import MelSpecConfig, MelSpectrogram
from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.train.ssl_train import (
    SSLTrainConfig,
    init_ssl_state,
    make_rdino_train_step,
    make_sdpn_train_step,
)
from speaker3d_tpu.utils.checkpoint import Checkpointer
from speaker3d_tpu.utils.config import build_config


def build_ssl_model(variant: str, config):
    backbone = ECAPA_TDNN(
        input_size=config.get("n_mels", 80),
        lin_neurons=config.get("embedding_dim", 512),
        channels=tuple(config.get("channels", (1024, 1024, 1024, 1024, 3072))),
        ssl_input_norm=True)
    if variant == "rdino":
        head = RDINOHead(out_dim=config.get("out_dim", 65536),
                         add_dim=config.get("add_dim", 8192),
                         bottleneck_dim=config.get("bottleneck_dim", 256))
        return RDINOCombiner(backbone=backbone, head=head)
    head = SDPNHead(bottleneck_dim=config.get("output_dim", 256))
    return SDPNCombiner(backbone=backbone, head=head)


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--variant", choices=["rdino", "sdpn"], default="rdino")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--profile_dir", default=None,
                        help="write a TensorBoard trace of a window of "
                             "train steps (utils/profiling.py)")
    parser.add_argument("--profile_steps", type=int, default=5)
    args, overrides = parser.parse_known_args(argv)
    from speaker3d_tpu.utils.misc import set_seed
    set_seed(args.seed)  # reference: bin/train_rdino.py set_seed
    config = build_config(args.config, overrides,
                          copy_to_exp_dir=jax.process_index() == 0)
    exp_dir = config["exp_dir"]

    glb_num = config.get("glb_num", 2 if args.variant == "rdino" else 1)
    local_num = config.get("local_num", 4)
    ds_cls = RDINODataset if args.variant == "rdino" else SDPNDataset
    dataset = ds_cls(config["data"], noise=config.get("noise"),
                     rir_bank=config.get("rir_bank"),
                     max_frames=config.get("max_frames", 400),
                     glb_num=glb_num, local_num=local_num)
    loader = SSLBatchLoader(dataset, config.get("batch_size", 64),
                            num_workers=config.get("num_workers", 8),
                            seed=args.seed,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    step_per_epoch = max(len(loader), 1)

    cfg = SSLTrainConfig(
        base_lr=config.get("lr", 0.2) * config.get("batch_size", 64)
        * jax.process_count() / 256.0,
        min_lr=config.get("min_lr", 1e-5),
        epochs=config.get("epochs", 150),
        step_per_epoch=step_per_epoch,
        warmup_epochs=config.get("warmup_epochs", 10),
        weight_decay=config.get("weight_decay", 1e-4),
        weight_decay_end=config.get("weight_decay_end", 1e-4),
        momentum_teacher=config.get("momentum_teacher", 0.996),
        clip_grad=config.get("clip_grad", 3.0),
        freeze_last_layer=config.get("freeze_last_layer", 1),
        ncrops=glb_num + local_num,
        out_dim=config.get("out_dim", 65536),
        num_proto=config.get("num_proto", 1024),
        output_dim=config.get("output_dim", 256),
        num_local_views=local_num,
        memax_weight=config.get("memax_weight", 1.0),
        koleo_weight=config.get("koleo_loss_weight", 0.1),
    )

    model = build_ssl_model(args.variant, config)
    import math as _math

    # config batch_size is PER-HOST here (reference SSL semantics: per-GPU
    # batch; the lr linear-scaling above multiplies by process_count). The
    # data axis spans all hosts' devices: a multiple of process_count so
    # every host owns equal mesh rows, dividing the per-host batch.
    n_proc = jax.process_count()
    n_local = len(jax.devices()) // n_proc
    n_data = n_proc * _math.gcd(config.get("batch_size", 64),
                                max(n_local, 1))
    from speaker3d_tpu.parallel.mesh import balanced_devices

    mesh = make_mesh(data=n_data, model=1, devices=balanced_devices(n_data))
    melspec = MelSpectrogram(MelSpecConfig(n_mels=config.get("n_mels", 80)))

    lg = int(config.get("max_frames", 400)) * 160
    example = np.zeros((1, (lg // 160) + 1, config.get("n_mels", 80)),
                       np.float32)
    state = init_ssl_state(jax.random.PRNGKey(args.seed), model, example, cfg,
                           mesh, args.variant)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    make_step = (make_rdino_train_step if args.variant == "rdino"
                 else make_sdpn_train_step)
    step_fn = make_step(model, cfg, mesh, host, feature_fn=melspec)

    ckpt = Checkpointer(os.path.join(exp_dir, "models"))
    log_path = os.path.join(exp_dir, "log.txt")
    # resume (reference: utils/utils_rdino.py restart_from_checkpoint)
    start_epoch = 0
    recovered = ckpt.recover_if_possible()
    if recovered is not None and "ssl_state" in recovered:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        state = jax.device_put(
            recovered["ssl_state"],
            jax.tree_util.tree_map(lambda _: rep, host))
        start_epoch = int(recovered["__meta__"]["epoch"])
        print(f"recovered from epoch {start_epoch}")
    from speaker3d_tpu.utils.preemption import GracefulShutdown
    from speaker3d_tpu.utils.profiling import StepTracer

    shutdown = GracefulShutdown()
    preempted = False  # collective poll() decision; the raw local
    # flag can diverge across ranks (see preemption.finalize)
    tracer = StepTracer(args.profile_dir, num_steps=args.profile_steps)
    if cfg.epochs == 0 and recovered is None and jax.process_index() == 0:
        # epochs: 0 -> snapshot the random-init teacher as CKPT-EPOCH-0 so
        # extract_ssl can embed with it (the SSL learn-gate's baseline,
        # tools/ssl_learn_probe.py)
        ckpt.save_checkpoint(0, {"ssl_state": jax.tree_util.tree_map(
            np.asarray, jax.device_get(state))})
    global_step = 0
    from speaker3d_tpu.data.prefetch import device_prefetch
    for epoch in range(start_epoch, cfg.epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        metrics_acc = []
        for batch in device_prefetch(loader, mesh=mesh):
            tracer.before_step(global_step)
            state, metrics = step_fn(state, batch)
            tracer.after_step(global_step,
                              wait_for=next(iter(metrics.values())))
            global_step += 1
            # keep device scalars; per-step float() would sync the pipeline
            metrics_acc.append(metrics)
            if shutdown.poll():  # pod-aware: any rank's signal
                preempted = True  # stops ALL ranks at this boundary
                break
        if preempted:
            if jax.process_index() == 0:
                host = jax.tree_util.tree_map(np.asarray,
                                              jax.device_get(state))
                # label = last COMPLETED epoch -> resume redoes this epoch
                d = ckpt.save_checkpoint(epoch, {"ssl_state": host})
                print(f"[preemption] checkpoint saved to {d}; exiting",
                      flush=True)
            break
        if jax.process_index() == 0 and metrics_acc:
            from speaker3d_tpu.utils.misc import fetch_mean

            avg = {k: fetch_mean([m[k] for m in metrics_acc])
                   for k in metrics_acc[0]}
            with open(log_path, "a") as f:
                f.write(json.dumps({"epoch": epoch, **avg,
                                    "time_s": round(time.time() - t0, 1)})
                        + "\n")
            host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
            ckpt.save_checkpoint(epoch + 1, {"ssl_state": host})
            print(f"epoch {epoch+1}: {avg}")
    tracer.close()
    shutdown.finalize(preempted)


if __name__ == "__main__":
    main()
