"""ASR-encoder-fused speaker training (train_para).

Behavioral contract (reference: speakerlab/bin/train_para.py): per step, a
FROZEN Paraformer-style ASR encoder consumes the acoustic features and the
speaker backbone + classifier train on its [B, T, d_model] output (the
reference wraps the encoder call in torch.no_grad and detaches, :165-168).

TPU-native design: the whole frozen front — fbank -> LFR -> CMVN -> SAN-M
encoder under stop_gradient — is the `feature_fn` of the standard SV train
step (train/sv_train.py), so freezing is by construction (encoder params are
closed over, never part of the optimizer state) and the entire fused step is
ONE compiled executable over the ('data','model') mesh. The encoder is the
native SANMEncoder (models/sanm.py) by default — initialized from
`encoder_ckpt` (.npz pytree) when given; the reference instead downloads a
funasr asset at run time.

Usage:
  python -m speaker3d_tpu.cli.train_para --config configs/eres2net_para.yaml
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import numpy as np

from speaker3d_tpu.data.dataset import BatchLoader, WavSVDataset
from speaker3d_tpu.data.processor_para import apply_lfr_device, load_cmvn
from speaker3d_tpu.data.processors import SpkLabelEncoder, SpkVeriAug, WavReader
from speaker3d_tpu.models.sanm import SANMEncoder
from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.train.sv_train import (
    SVTrainConfig,
    init_sv_train_state,
    make_sv_train_step,
    state_shardings,
)
from speaker3d_tpu.utils.builder import dynamic_import
from speaker3d_tpu.utils.checkpoint import Checkpointer, EpochCounter, EpochLogger
from speaker3d_tpu.utils.config import build_config


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a speaker model on frozen ASR-encoder features")
    parser.add_argument("--config", required=True)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--profile_dir", default=None,
                        help="write a TensorBoard trace of a window of "
                             "train steps (utils/profiling.py)")
    parser.add_argument("--profile_steps", type=int, default=5)
    args, overrides = parser.parse_known_args(argv)
    return args, overrides


def build_frozen_frontend(config, seed: int):
    """fbank -> LFR -> CMVN -> stop_gradient(encoder): one device callable."""
    import jax.numpy as jnp

    fs = config.get("sample_rate", 16000)
    n_mels = config.get("fbank_dim", 80)
    lfr_m = config.get("lfr_m", 7)
    lfr_n = config.get("lfr_n", 6)
    # Paraformer features use a HAMMING window (reference:
    # speakerlab/process/processor_para.py FBank -> Kaldi.fbank
    # window_type='hamming'); mean_nor follows the recipe conf
    # (egs/.../conf/eres2net_para.yaml feature_extractor mean_nor: True).
    # The reference's wav*(1<<15) scaling is a constant log-offset that the
    # mean-norm removes; with mean_norm disabled, CMVN absorbs it.
    fbank = KaldiFbank(
        FbankConfig(sample_rate=fs, num_mel_bins=n_mels,
                    window_type=config.get("fbank_window", "hamming")),
        mean_norm=config.get("fbank_mean_nor", True))

    enc_cfg = config.get("asr_encoder", {})
    enc_cls = dynamic_import(enc_cfg["obj"]) if "obj" in enc_cfg else SANMEncoder
    enc_args = dict(enc_cfg.get("args", {}))
    enc_args.setdefault("input_dim", n_mels * lfr_m)
    encoder = enc_cls(**enc_args)

    cmvn = None
    if config.get("cmvn_file"):
        cmvn = np.asarray(load_cmvn(config["cmvn_file"]))

    # encoder params: from checkpoint if given, else seeded random (a usable
    # random-feature encoder; training the speaker model on top still works)
    wav_len = int(config.get("wav_len", 3.0) * fs)
    example = np.zeros((1, wav_len), np.float32)
    ex_feats = np.asarray(fbank(example))
    ex_lfr = np.asarray(apply_lfr_device(ex_feats, lfr_m, lfr_n))
    if config.get("encoder_ckpt"):
        ckpt = config["encoder_ckpt"]
        if ckpt.endswith((".pt", ".pth", ".bin", ".pb")):
            # a funasr Paraformer model.pt (or encoder-only state_dict)
            from speaker3d_tpu.compat.funasr_convert import load_funasr_encoder

            enc_params = load_funasr_encoder(ckpt, encoder, ex_lfr)
        else:
            import pickle

            with open(ckpt, "rb") as f:
                enc_params = pickle.load(f)
    else:
        enc_params = jax.jit(encoder.init, static_argnames=("train",))(
            jax.random.PRNGKey(seed + 7), ex_lfr, train=False)["params"]
        enc_params = jax.tree_util.tree_map(np.asarray, enc_params)

    def feature_fn(wavs):
        feats = fbank(wavs)
        feats = apply_lfr_device(feats, lfr_m, lfr_n)
        if cmvn is not None:
            c = jnp.asarray(cmvn, feats.dtype)
            feats = (feats + c[0][None, None]) * c[1][None, None]
        out = encoder.apply({"params": enc_params}, feats, train=False)
        return jax.lax.stop_gradient(out)

    d_model = int(np.asarray(
        encoder.apply({"params": enc_params}, ex_lfr, train=False)).shape[-1])
    return feature_fn, d_model, wav_len


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    args, overrides = get_args(argv)
    from speaker3d_tpu.utils.misc import set_seed
    set_seed(args.seed)  # reference: bin/train_para.py set_seed
    config = build_config(args.config, overrides,
                          copy_to_exp_dir=jax.process_index() == 0)
    exp_dir = config["exp_dir"]
    os.makedirs(exp_dir, exist_ok=True)

    wav_reader = WavReader(
        sample_rate=config.get("sample_rate", 16000),
        duration=config.get("wav_len", 3.0),
        speed_pertub=config.get("speed_pertub", False),
    )
    label_encoder = SpkLabelEncoder(config["data"])
    aug = SpkVeriAug(
        aug_prob=config.get("aug_prob", 0.0),
        noise_file=config.get("noise"),
        reverb_file=config.get("reverb"),
    ) if config.get("aug_prob", 0.0) > 0 else None
    dataset = WavSVDataset(config["data"], wav_reader, label_encoder, aug)
    loader = BatchLoader(
        dataset, batch_size=config.get("batch_size", 128),
        num_workers=config.get("num_workers", 8), seed=args.seed,
        process_index=jax.process_index(), process_count=jax.process_count())
    step_per_epoch = max(len(loader), 1)

    feature_fn, d_model, wav_len = build_frozen_frontend(config, args.seed)

    model_cls = dynamic_import(config["model"]["obj"])
    margs = dict(config["model"].get("args", {}))
    margs.setdefault("feat_dim", d_model)
    model = model_cls(**margs)

    n_model = config.get("model_parallel", 1)
    n_dev = len(jax.devices())
    per_host_batch = config.get("batch_size", 128) // jax.process_count()
    n_data = math.gcd(per_host_batch, max(n_dev // n_model, 1))
    mesh = make_mesh(data=n_data, model=n_model,
                     devices=jax.devices()[: n_data * n_model])

    cfg = SVTrainConfig(
        num_classes=dataset.num_classes,
        embedding_size=config.get("embedding_size", 192),
        weight_decay=config.get("weight_decay", 1e-4),
        min_lr=config.get("min_lr", 1e-4),
        max_lr=config.get("max_lr", 0.2),
        warmup_epoch=config.get("warmup_epoch", 5),
        fix_epoch=config.get("num_epoch", 70),
        step_per_epoch=step_per_epoch,
        initial_margin=config.get("initial_margin", 0.0),
        final_margin=config.get("final_margin", 0.3),
        increase_start_epoch=config.get("increase_start_epoch", 20),
        margin_fix_epoch=config.get("margin_fix_epoch", 50),
        scale=config.get("scale", 32.0),
        remat=config.get("remat", False),
        compute_dtype=config.get("compute_dtype", "float32"),
    )

    rng = jax.random.PRNGKey(args.seed)
    example_feats = np.asarray(feature_fn(np.zeros((1, wav_len), np.float32)))
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, example_feats, train=True)
    state = init_sv_train_state(rng, model, example_feats, cfg, mesh,
                                backbone_variables=variables)
    host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    train_step = make_sv_train_step(model, cfg, mesh, host_state,
                                    feature_fn=feature_fn)

    epoch_counter = EpochCounter(config.get("num_epoch", 70))
    checkpointer = Checkpointer(os.path.join(exp_dir, "models"),
                                recoverables={"epoch_counter": epoch_counter})
    recovered = checkpointer.recover_if_possible()
    if recovered is not None and "train_state" in recovered:
        state = jax.device_put(recovered["train_state"],
                               state_shardings(host_state, mesh))
        print(f"recovered from epoch {recovered['__meta__']['epoch']}")

    logger = EpochLogger(os.path.join(exp_dir, "train_epoch.log"))
    label_encoder.save(os.path.join(exp_dir, "label_encoder.pkl"))
    log_every = config.get("log_batch_freq", 50)
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
                      f"lr {float(metrics['lr']):.5f}", flush=True)
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
