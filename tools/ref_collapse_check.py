"""Toy-scale ERes2NetV2 collapse: cross-check on the REFERENCE torch trainer.

Closes the r4 loophole: the flagship's exemption from the EER learn-gate
rests on the measured fact that reduced ERes2NetV2 collapses emb-emb
cosines to ~1.0 at toy scale — but that was only ever measured on THIS
repo's trainer. If the collapse were a bug in our train path (BN
semantics, margin scheduling, init), weight-parity tests would not catch
it. This tool trains the SAME reduced architectures on the SAME synthetic
corpus with BOTH stacks and reports the embedding cosine spread:

  A) our stack: the real cli.train + cli.extract surfaces;
  B) the reference stack: speakerlab's own torch ERes2NetV2 +
     CosineClassifier + ArcMarginLoss + WarmupCosine/Margin schedulers,
     stepped exactly like speakerlab/bin/train.py:134-166 (per-iter
     lr/margin step with iter_num=(epoch-1)*len(loader)+i, SGD momentum
     0.9 nesterov wd 1e-4) — single process, CPU, random init. Features
     come from our Kaldi fbank (oracle-pinned vs the reference C++
     frontend, tests/test_fbank_ref_oracle.py; dither=0), mean-normed,
     the same features our trainer computes on device.

If BOTH stacks collapse (within ~= cross ~= 1.0), the Xvector gate
exemption is validated as an architecture-at-toy-scale property. If the
reference learns where we collapse, our train path has a bug.

CPU-only (never touches the TPU tunnel). Run:
  python tools/ref_collapse_check.py [--m_channels 16 32] [--epochs 12]
Output: one JSON line per (stack, m_channels) + a verdict line.
Results recorded in docs/PARITY.md.
"""

import argparse
import json
import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 16000
TRAIN_F0S = [105.0, 140.0, 175.0, 210.0, 245.0, 280.0, 315.0, 350.0]
EVAL_F0S = [120.0, 190.0, 260.0, 330.0]  # held-out "speakers"


def _voice(rng, n, f0):
    """Same synthetic speaker family as tests/test_sv_eer_convergence.py."""
    t = np.arange(n) / FS
    f = f0 * (1 + 0.015 * rng.standard_normal())
    sig = (np.sin(2 * np.pi * f * t) + 0.5 * np.sin(2 * np.pi * 2 * f * t)
           + 0.25 * np.sin(2 * np.pi * 3 * f * t))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t + rng.uniform(0, 6.28))
    return (0.3 * am * sig + 0.004 * rng.standard_normal(n)).astype(np.float32)


def build_corpus(root):
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(11)
    rows, eval_utts = [], []
    for s, f0 in enumerate(TRAIN_F0S):
        for u in range(10):
            p = f"{root}/tr_spk{s}_u{u}.wav"
            write_wav(p, _voice(rng, 7 * FS, f0), FS)
            rows.append((f"tr_spk{s}_u{u}", p, s))
    for s, f0 in enumerate(EVAL_F0S):
        for u in range(6):
            p = f"{root}/ev_spk{s}_u{u}.wav"
            write_wav(p, _voice(rng, 3 * FS, f0), FS)
            eval_utts.append((p, s))
    csv = f"{root}/train.csv"
    with open(csv, "w") as f:
        f.write("ID,wav,spk\n")
        f.writelines(f"{rid},{p},spk{s}\n" for rid, p, s in rows)
    return csv, rows, eval_utts


def cosine_stats(embs, spks):
    z = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-12)
    aff = z @ z.T
    spks = np.asarray(spks)
    same = spks[:, None] == spks[None, :]
    iu = np.triu_indices(len(spks), k=1)
    within = aff[iu][same[iu]]
    cross = aff[iu][~same[iu]]
    return {"within_mean": round(float(within.mean()), 4),
            "within_min": round(float(within.min()), 4),
            "cross_mean": round(float(cross.mean()), 4),
            "cross_max": round(float(cross.max()), 4),
            "gap": round(float(within.mean() - cross.mean()), 4)}


# ---- stack B: the reference's own torch training loop ----------------------

def run_reference(m_channels, epochs, batch, rows, eval_utts, fbank_np,
                  emb_size, seed=1234):
    """Train speakerlab's torch stack like speakerlab/bin/train.py does
    (single rank; data order from a seeded np RNG instead of the CUDA
    DataLoader, features precomputed by our oracle-pinned fbank)."""
    sys.path.insert(0, "/root/reference")
    import torch

    from speakerlab.loss.margin_loss import ArcMarginLoss
    from speakerlab.models.campplus.classifier import CosineClassifier
    from speakerlab.models.eres2net.ERes2NetV2 import ERes2NetV2
    from speakerlab.process.scheduler import (
        MarginScheduler,
        WarmupCosineScheduler,
    )

    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)

    model = ERes2NetV2(num_blocks=[1, 1, 1, 1], m_channels=m_channels,
                       feat_dim=80, embedding_size=emb_size)
    classifier = CosineClassifier(input_dim=emb_size,
                                  out_neurons=len(TRAIN_F0S))
    net = torch.nn.Sequential(model, classifier)
    criterion = ArcMarginLoss(scale=32.0, margin=0.0)
    optimizer = torch.optim.SGD(net.parameters(), lr=0.1, momentum=0.9,
                                nesterov=True, weight_decay=1e-4)
    step_per_epoch = len(rows) // batch
    # gate hyperparameters (tests/test_sv_eer_convergence.py::_train):
    # warmup 2, margin ramp epochs 3..8 to 0.3, cosine to min_lr 0.01
    lr_sched = WarmupCosineScheduler(optimizer, min_lr=0.01, max_lr=0.1,
                                     warmup_epoch=2, fix_epoch=epochs,
                                     step_per_epoch=step_per_epoch)
    margin_sched = MarginScheduler(criterion, increase_start_epoch=3,
                                   fix_epoch=8, step_per_epoch=step_per_epoch,
                                   initial_margin=0.0, final_margin=0.3)

    wavs = {p: None for _, p, _ in rows}
    from speaker3d_tpu.utils.fileio import load_audio
    for p in wavs:
        wavs[p] = np.asarray(load_audio(p, None, FS))[0]

    crop = 3 * FS
    accs = []
    net.train()
    for epoch in range(1, epochs + 1):
        order = rng.permutation(len(rows))
        for i in range(step_per_epoch):
            iter_num = (epoch - 1) * step_per_epoch + i
            lr_sched.step(iter_num)
            margin_sched.step(iter_num)
            idx = order[i * batch:(i + 1) * batch]
            xs, ys = [], []
            for j in idx:
                _, p, s = rows[j]
                w = wavs[p]
                st = rng.integers(0, len(w) - crop + 1)
                xs.append(w[st:st + crop])
                ys.append(s)
            feats = fbank_np(np.stack(xs))  # [B, T, 80] mean-normed
            x = torch.from_numpy(feats)
            y = torch.tensor(ys, dtype=torch.long)
            out = net(x)
            loss = criterion(out, y)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            accs.append(float((out.argmax(1) == y).float().mean()))
        print(f"[ref m{m_channels}] epoch {epoch}/{epochs} "
              f"loss {float(loss):.4f} acc {accs[-1]:.3f}", flush=True)

    net.eval()
    embs, spks = [], []
    with torch.no_grad():
        for p, s in eval_utts:
            w = np.asarray(load_audio(p, None, FS))[0]
            feats = fbank_np(w[None, :])
            embs.append(model(torch.from_numpy(feats)).numpy()[0])
            spks.append(s)
    stats = cosine_stats(np.stack(embs), spks)
    stats["train_acc_tail"] = round(float(np.mean(accs[-2 * step_per_epoch:])),
                                    3)
    return stats


# ---- stack A: our real CLI surfaces ---------------------------------------

def run_ours(m_channels, epochs, batch, root, csv, eval_utts, emb_size):
    import yaml

    from speaker3d_tpu.cli.extract import main as extract_main
    from speaker3d_tpu.cli.train import main as train_main

    exp = f"{root}/exp_m{m_channels}"
    cfg = {"exp_dir": exp, "data": csv, "wav_len": 3.0,
           "speed_pertub": False, "aug_prob": 0.0, "batch_size": batch,
           "num_workers": 2, "num_epoch": epochs, "embedding_size": emb_size,
           "max_lr": 0.1, "min_lr": 0.01, "warmup_epoch": 2,
           "log_batch_freq": 50, "increase_start_epoch": 3,
           "margin_fix_epoch": 8,
           "model": {"obj": "speaker3d_tpu.models.eres2netv2.ERes2NetV2",
                     "args": {"feat_dim": 80, "embedding_size": emb_size,
                              "m_channels": m_channels,
                              "num_blocks": [1, 1, 1, 1]}}}
    cfg_path = f"{root}/cfg_m{m_channels}.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config", cfg_path])

    scp = f"{root}/eval_m{m_channels}.scp"
    with open(scp, "w") as f:
        for p, s in eval_utts:
            f.write(f"{os.path.basename(p)[:-4]} {p}\n")
    emb_dir = f"{root}/emb_m{m_channels}"
    extract_main(["--exp_dir", exp, "--data", scp, "--out_dir", emb_dir,
                  "--mode", "exact"])
    shard = np.load(os.path.join(emb_dir, "embeddings_0.npz"))
    embs, spks = [], []
    for p, s in eval_utts:
        embs.append(shard[os.path.basename(p)[:-4]])
        spks.append(s)
    return cosine_stats(np.stack(embs), spks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m_channels", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--emb_size", type=int, default=32)
    ap.add_argument("--root", default=None)
    ap.add_argument("--skip_ours", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")

    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    fbank_np = lambda w: np.asarray(fbank(w))  # noqa: E731

    root = args.root or tempfile.mkdtemp(prefix="collapse_")
    os.makedirs(root, exist_ok=True)
    csv, rows, eval_utts = build_corpus(root)

    results = {}
    for m in args.m_channels:
        ref = run_reference(m, args.epochs, args.batch, rows, eval_utts,
                            fbank_np, args.emb_size)
        print(json.dumps({"stack": "reference-torch", "m_channels": m,
                          **ref}), flush=True)
        results[("ref", m)] = ref
        if not args.skip_ours:
            ours = run_ours(m, args.epochs, args.batch, root, csv,
                            eval_utts, args.emb_size)
            print(json.dumps({"stack": "speaker3d-tpu", "m_channels": m,
                              **ours}), flush=True)
            results[("ours", m)] = ours

    # verdict: does the reference reproduce the collapse (tiny within/cross
    # gap on held-out speakers) that motivated the Xvector gate choice?
    verdict = {k[0] + f"_m{k[1]}": v["gap"] for k, v in results.items()}
    ref_collapsed = all(v["gap"] < 0.05 for k, v in results.items()
                        if k[0] == "ref")
    print(json.dumps({"verdict": "reference collapses too"
                      if ref_collapsed else
                      "REFERENCE LEARNS — our trainer may have a bug",
                      "gaps": verdict}), flush=True)


if __name__ == "__main__":
    main()
