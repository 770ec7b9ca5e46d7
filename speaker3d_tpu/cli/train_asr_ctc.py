"""CTC ASR trainer CLI (SAN-M encoder + CTC head, speaker3d_tpu/asr/ctc.py).

New capability vs the reference, which downloads a modelscope Paraformer for
speaker-attributed transcription (reference: egs/3dspeaker/
speaker-diarization/local/out_transcription.py:29) — this trains an in-repo
recognizer whose greedy decode feeds the same attribution pipeline
(cli/transcribe_diarization.py --asr_exp_dir).

Config keys: exp_dir, data (CSV with ID,wav,text — text is space-separated
tokens), sample_rate, wav_len, batch_size, num_epoch, lr schedule knobs,
model.args (SANMCTC kwargs minus vocab_size). The vocabulary is built from
the training texts and saved to exp_dir/vocab.json.

Usage:
  python -m speaker3d_tpu.cli.train_asr_ctc --config configs/asr_ctc.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time

import jax
import numpy as np

from speaker3d_tpu.asr.ctc import (
    CTCTrainConfig,
    SANMCTC,
    init_ctc_train_state,
    make_ctc_train_step,
)
from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.utils.checkpoint import Checkpointer, EpochCounter, EpochLogger
from speaker3d_tpu.utils.config import build_config
from speaker3d_tpu.utils.fileio import load_audio, load_data_csv


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Train the CTC ASR")
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

    fs = config.get("sample_rate", 16000)
    wav_len = int(config.get("wav_len", 4.0) * fs)
    rows = load_data_csv(config["data"])
    vocab = sorted({tok for r in rows.values()
                    for tok in str(r["text"]).split()})
    tok2id = {t: i + 1 for i, t in enumerate(vocab)}  # 0 = CTC blank
    if jax.process_index() == 0:
        with open(os.path.join(exp_dir, "vocab.json"), "w") as f:
            json.dump(vocab, f, ensure_ascii=False)

    keys = sorted(rows)
    max_u = max(len(str(rows[k]["text"]).split()) for k in keys)
    import math

    from speaker3d_tpu.parallel.mesh import balanced_devices

    batch_size = config.get("batch_size", 16)
    n_proc = jax.process_count()
    per_host = batch_size // n_proc
    n_local = len(jax.devices()) // n_proc
    n_data = n_proc * math.gcd(max(per_host, 1), max(n_local, 1))
    mesh = make_mesh(data=n_data, model=1, devices=balanced_devices(n_data))

    def load_sample(key, rng):
        wav = load_audio(rows[key]["wav"], obj_fs=fs)[0]
        if wav.shape[0] >= wav_len:
            s = rng.integers(0, wav.shape[0] - wav_len + 1)
            wav = wav[s:s + wav_len]
        else:
            wav = np.pad(wav, (0, wav_len - wav.shape[0]))
        toks = [tok2id[t] for t in str(rows[key]["text"]).split()]
        labels = np.zeros(max_u, np.int32)
        labels[:len(toks)] = toks
        return wav.astype(np.float32), labels, np.int32(len(toks))

    def batches(epoch):
        order = list(keys)
        random.Random(args.seed + epoch).shuffle(order)
        order = order[jax.process_index()::jax.process_count()]
        # every process must run the SAME number of psum-bearing steps or
        # the pod deadlocks: truncate to the common floor
        n_common = (len(keys) // jax.process_count() // per_host) * per_host
        order = order[:n_common]
        rng = np.random.default_rng(args.seed * 1000 + epoch)
        for i in range(0, len(order) - per_host + 1, per_host):
            samples = [load_sample(k, rng) for k in order[i:i + per_host]]
            yield {"wavs": np.stack([s[0] for s in samples]),
                   "labels": np.stack([s[1] for s in samples]),
                   "label_lens": np.asarray([s[2] for s in samples],
                                            np.int32)}

    step_per_epoch = max(len(keys) // jax.process_count()
                         // per_host, 1)
    cfg = CTCTrainConfig(
        min_lr=config.get("min_lr", 1e-5),
        max_lr=config.get("max_lr", 2e-3),
        warmup_epoch=config.get("warmup_epoch", 1),
        fix_epoch=config.get("num_epoch", 20),
        step_per_epoch=step_per_epoch,
        weight_decay=config.get("weight_decay", 1e-6))

    model = SANMCTC(vocab_size=len(vocab),
                    **config.get("model", {}).get("args", {}))
    # GLOBAL CMVN (the Paraformer frontend convention, am.mvn — see
    # data/processor_para.py): per-utterance mean-norm couples every
    # frame's features to the silence fraction of its window, which breaks
    # the transcriber's sliding-window decode; global stats don't.
    fbank = KaldiFbank(FbankConfig(sample_rate=fs,
                                   num_mel_bins=config.get("n_mels", 80)),
                       mean_norm=False)
    stat_keys = keys[: min(len(keys), 64)]
    stats = []
    for k in stat_keys:
        wav = load_audio(rows[k]["wav"], obj_fs=fs)[0][:wav_len]
        stats.append(np.asarray(fbank(wav[None]))[0])
    stats = np.concatenate(stats, axis=0)
    cmvn = np.stack([stats.mean(axis=0),
                     stats.std(axis=0) + 1e-6]).astype(np.float32)
    if jax.process_index() == 0:
        np.save(os.path.join(exp_dir, "cmvn.npy"), cmvn)

    def feature_fn(wavs):
        return (fbank(wavs) - cmvn[0]) / cmvn[1]

    example = np.asarray(feature_fn(np.zeros((1, wav_len), np.float32)))
    state = init_ctc_train_state(jax.random.PRNGKey(args.seed), model,
                                 example, mesh)
    host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_ctc_train_step(model, cfg, mesh, host_state,
                               feature_fn=feature_fn)

    epoch_counter = EpochCounter(config.get("num_epoch", 20))
    checkpointer = Checkpointer(os.path.join(exp_dir, "models"),
                                recoverables={"epoch_counter": epoch_counter})
    recovered = checkpointer.recover_if_possible()
    if recovered is not None and "train_state" in recovered:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        state = jax.device_put(recovered["train_state"],
                               jax.tree_util.tree_map(lambda _: rep,
                                                      host_state))
    logger = EpochLogger(os.path.join(exp_dir, "train_epoch.log"))

    from speaker3d_tpu.data.prefetch import device_prefetch
    for epoch in epoch_counter:
        t0 = time.time()
        losses = []
        for batch in device_prefetch(batches(epoch), mesh=mesh):
            state, metrics = step(state, batch)
            losses.append(metrics["loss"])
        if jax.process_index() == 0 and losses:
            avg = float(np.mean([float(v) for v in losses]))
            logger.log_stats({"epoch": epoch,
                              "time_s": round(time.time() - t0, 1)},
                             {"avg_loss": avg})
            print(f"epoch {epoch} avg_loss {avg:.4f}", flush=True)
            host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
            checkpointer.save_checkpoint(epoch, {"train_state": host})


if __name__ == "__main__":
    main()
