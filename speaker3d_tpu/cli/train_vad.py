"""DFSMN VAD trainer CLI (new capability — the reference downloads external
VAD models instead of training one; see models/fsmn_vad.py).

Usage:
  python -m speaker3d_tpu.cli.train_vad --config configs/fsmn_vad.yaml \
      [--any_yaml_key=value ...]

Config keys: exp_dir, speech (csv/scp/list of speech wavs), noise (optional
scp), window_dur, batch_size, num_epoch, lr schedule, model.args
(FSMNVad kwargs). The trained experiment plugs into diarization via
`python -m speaker3d_tpu.cli.infer_diarization --vad_exp_dir <exp_dir>`.
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import numpy as np

from speaker3d_tpu.data.dataset import BatchLoader
from speaker3d_tpu.data.dataset_vad import SyntheticVadDataset
from speaker3d_tpu.models.fsmn_vad import FSMNVad
from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.train.vad_train import (
    VadTrainConfig,
    init_vad_train_state,
    make_vad_train_step,
)
from speaker3d_tpu.utils.checkpoint import Checkpointer, EpochCounter, EpochLogger
from speaker3d_tpu.utils.config import build_config


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Train the DFSMN VAD")
    parser.add_argument("--config", required=True)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--profile_dir", default=None,
                        help="write a TensorBoard trace of a window of "
                             "train steps (utils/profiling.py)")
    parser.add_argument("--profile_steps", type=int, default=5)
    args, overrides = parser.parse_known_args(argv)
    return args, overrides


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    args, overrides = get_args(argv)
    from speaker3d_tpu.utils.misc import set_seed
    set_seed(args.seed)
    config = build_config(args.config, overrides,
                          copy_to_exp_dir=jax.process_index() == 0)
    exp_dir = config["exp_dir"]
    os.makedirs(exp_dir, exist_ok=True)

    fs = config.get("sample_rate", 16000)
    dataset = SyntheticVadDataset(
        speech=config["speech"],
        noise=config.get("noise"),
        sample_rate=fs,
        window_dur=config.get("window_dur", 4.0),
        max_events=config.get("max_events", 3),
        min_event_dur=config.get("min_event_dur", 0.4),
        snr_range=tuple(config.get("snr_range", (0.0, 20.0))),
        seed=args.seed,
        size=config.get("dataset_size"),
    )
    loader = BatchLoader(
        dataset,
        batch_size=config.get("batch_size", 64),
        num_workers=config.get("num_workers", 4),
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    step_per_epoch = max(len(loader), 1)

    margs = dict(config.get("model", {}).get("args", {}))
    model = FSMNVad(**margs)

    n_dev = len(jax.devices())
    per_host_batch = config.get("batch_size", 64) // jax.process_count()
    n_data = math.gcd(per_host_batch, n_dev)
    mesh = make_mesh(data=n_data, model=1, devices=jax.devices()[:n_data])

    cfg = VadTrainConfig(
        min_lr=config.get("min_lr", 1e-5),
        max_lr=config.get("max_lr", 1e-3),
        warmup_epoch=config.get("warmup_epoch", 1),
        fix_epoch=config.get("num_epoch", 10),
        step_per_epoch=step_per_epoch,
        weight_decay=config.get("weight_decay", 1e-5),
    )

    # mean_norm=False: absolute log-mel features (levels are augmented by the
    # synthetic mixer). Window-relative normalization would make inference
    # depend on chunk-window statistics — see diar/dnn_vad.py.
    fbank = KaldiFbank(FbankConfig(sample_rate=fs,
                                   num_mel_bins=model.feat_dim),
                       mean_norm=False)
    rng = jax.random.PRNGKey(args.seed)
    example_wav = np.zeros((1, dataset.win), np.float32)
    example_feats = np.asarray(fbank(example_wav))
    state = init_vad_train_state(rng, model, example_feats, mesh)
    host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    train_step = make_vad_train_step(model, cfg, mesh, host_state,
                                     feature_fn=fbank)

    epoch_counter = EpochCounter(config.get("num_epoch", 10))
    checkpointer = Checkpointer(os.path.join(exp_dir, "models"),
                                recoverables={"epoch_counter": epoch_counter})
    recovered = checkpointer.recover_if_possible()
    if recovered is not None and "train_state" in recovered:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        state = jax.device_put(recovered["train_state"],
                               jax.tree_util.tree_map(lambda _: rep,
                                                      host_state))
        print(f"recovered from epoch {recovered['__meta__']['epoch']}")

    logger = EpochLogger(os.path.join(exp_dir, "train_epoch.log"))
    log_every = config.get("log_batch_freq", 10)
    from speaker3d_tpu.utils.preemption import (
        GracefulShutdown,
        save_preemption_checkpoint,
    )
    from speaker3d_tpu.utils.profiling import StepTracer

    shutdown = GracefulShutdown()
    preempted = False  # collective poll() decision; the raw local
    # flag can diverge across ranks (see preemption.finalize)
    tracer = StepTracer(args.profile_dir, num_steps=args.profile_steps)
    global_step = 0
    from speaker3d_tpu.data.prefetch import device_prefetch
    from speaker3d_tpu.utils.misc import fetch_mean
    for epoch in epoch_counter:
        loader.set_epoch(epoch)
        t0 = time.time()
        losses, accs = [], []
        for i, batch in enumerate(device_prefetch(loader, mesh=mesh)):
            tracer.before_step(global_step)
            state, metrics = train_step(state, batch)
            tracer.after_step(global_step, wait_for=metrics["loss"])
            global_step += 1
            if shutdown.poll():  # pod-aware: any rank's signal
                preempted = True  # stops ALL ranks at this boundary
                break
            # keep device scalars; fetching floats every step would sync
            # the pipeline per step — convert only at log points
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
            if (i + 1) % log_every == 0:
                print(f"epoch {epoch} step {i+1}/{step_per_epoch} "
                      f"loss {float(losses[-1]):.4f} acc {float(accs[-1]):.3f} "
                      f"lr {float(metrics['lr']):.6f}", flush=True)
        if preempted:
            if jax.process_index() == 0:
                host = jax.tree_util.tree_map(np.asarray,
                                              jax.device_get(state))
                save_preemption_checkpoint(
                    checkpointer, epoch_counter, epoch,
                    {"train_state": host})
            break
        if jax.process_index() == 0:
            logger.log_stats(
                {"epoch": epoch, "time_s": round(time.time() - t0, 1)},
                {"avg_loss": fetch_mean(losses) if losses else None,
                 "avg_acc": fetch_mean(accs) if accs else None})
            host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
            checkpointer.save_checkpoint(epoch, {"train_state": host})
    tracer.close()
    shutdown.finalize(preempted)


if __name__ == "__main__":
    main()
