"""SSL learning probe: does toy-scale SDPN/RDINO training IMPROVE speaker
separation over the random-init teacher? (VERDICT r4 item 3)

Protocol (mirrors the supervised gate's measure-then-pin approach,
tests/test_sv_eer_convergence.py): synthetic voices whose identity is a
fixed HARMONIC-AMPLITUDE signature while f0 varies per utterance — so a
random-init embedding (dominated by pitch/mel-energy placement) separates
speakers poorly, and SSL training has something real to learn from
augment-invariance across crops of the same utterance. Reference behavior
being modeled: egs/voxceleb/sv-sdpn (EER 1.80 from scratch) /
sv-rdino (3.16), speakerlab/bin/train_sdpn.py.

Measures, via the REAL CLI surfaces:
  1. random-init teacher EER (train_ssl with epochs: 0 snapshots the
     init state as CKPT-EPOCH-0 without training)  -- baseline
  2. trained teacher EER after N epochs (cli.train_ssl -> cli.extract_ssl)
on an all-pairs trial list over held-out speakers.

CPU-only. Run:  python tools/ssl_learn_probe.py [--variant sdpn]
                    [--epochs 6] [--spk 8] [--utt 8]
Output: JSON lines with init/trained EER; the pinned CI gate lives in
tests/test_ssl_eer_convergence.py with headroom over these measurements.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 16000


def ssl_voice(rng, n, weights, f0=None):
    """A 'speaker' is a fixed harmonic amplitude signature `weights` [6];
    each utterance draws its own f0, AM and phases."""
    t = np.arange(n) / FS
    if f0 is None:
        f0 = rng.uniform(110.0, 280.0)
    sig = np.zeros(n)
    for h, w in enumerate(weights, start=1):
        sig += w * np.sin(2 * np.pi * h * f0 * t + rng.uniform(0, 6.28))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(2.0, 4.0) * t
                            + rng.uniform(0, 6.28))
    x = 0.25 * am * sig / (np.abs(sig).max() + 1e-6) * 3.0
    return (x + 0.01 * rng.standard_normal(n)).astype(np.float32)


def speaker_weights(rng, k):
    """k well-separated harmonic signatures (unit-norm, positive)."""
    w = rng.uniform(0.05, 1.0, size=(k, 6))
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    return w


def build_corpus(root, n_spk, n_utt, n_eval_spk=4, n_eval_utt=6, seed=7):
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(seed)
    weights = speaker_weights(rng, n_spk + n_eval_spk)
    scp = os.path.join(root, "train.scp")
    with open(scp, "w") as f:
        for s in range(n_spk):
            for u in range(n_utt):
                p = os.path.join(root, f"tr_s{s}_u{u}.wav")
                write_wav(p, ssl_voice(rng, 5 * FS, weights[s]), FS)
                f.write(f"tr_s{s}_u{u} {p}\n")
    eval_scp = os.path.join(root, "eval.scp")
    eval_utts = []
    with open(eval_scp, "w") as f:
        for s in range(n_eval_spk):
            for u in range(n_eval_utt):
                uid = f"ev_s{s}_u{u}"
                p = os.path.join(root, f"{uid}.wav")
                write_wav(p, ssl_voice(rng, 3 * FS, weights[n_spk + s]), FS)
                f.write(f"{uid} {p}\n")
                eval_utts.append((uid, s))
    return scp, eval_scp, eval_utts


def eer_from_embs(emb_dir, eval_utts):
    from speaker3d_tpu.eval.scoring import load_embeddings
    from speaker3d_tpu.utils.metrics import compute_eer

    embs = load_embeddings(emb_dir)
    scores, labels = [], []
    for i in range(len(eval_utts)):
        for j in range(i + 1, len(eval_utts)):
            a, b = embs[eval_utts[i][0]], embs[eval_utts[j][0]]
            cos = float(np.dot(a, b)
                        / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
            scores.append(cos)
            labels.append(int(eval_utts[i][1] == eval_utts[j][1]))
    return float(compute_eer(np.asarray(scores), np.asarray(labels)))


def run(variant, epochs, root, scp, eval_scp, eval_utts, probe_init):
    import yaml

    from speaker3d_tpu.cli.extract_ssl import main as ex_main
    from speaker3d_tpu.cli.train_ssl import main as ssl_main

    tag = "init" if probe_init else f"ep{epochs}"
    exp = os.path.join(root, f"exp_{variant}_{tag}")
    config = {
        "exp_dir": exp, "data": scp,
        "max_frames": 200,                 # 2 s globals, 1 s locals
        "local_num": 4, "batch_size": 16, "num_workers": 2,
        "epochs": 0 if probe_init else epochs, "warmup_epochs": 1,
        "lr": 0.05, "n_mels": 80,
        "embedding_dim": 64, "out_dim": 256, "add_dim": 64,
        "bottleneck_dim": 32, "num_proto": 64, "output_dim": 64,
        "channels": [64, 64, 64, 64, 192],
    }
    cfg_path = os.path.join(root, f"cfg_{variant}_{tag}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    ssl_main(["--config", cfg_path, "--variant", variant])
    emb_dir = os.path.join(exp, "embs")
    ex_main(["--exp_dir", exp, "--data", eval_scp, "--out_dir", emb_dir,
             "--variant", variant])
    return eer_from_embs(emb_dir, eval_utts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="sdpn", choices=["sdpn", "rdino"])
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--spk", type=int, default=8)
    ap.add_argument("--utt", type=int, default=8)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    root = args.root or tempfile.mkdtemp(prefix="ssl_probe_")
    os.makedirs(root, exist_ok=True)
    scp, eval_scp, eval_utts = build_corpus(root, args.spk, args.utt)

    init_eer = run(args.variant, 0, root, scp, eval_scp, eval_utts, True)
    print(json.dumps({"variant": args.variant, "stage": "random-init",
                      "eer": round(init_eer, 4)}), flush=True)
    trained_eer = run(args.variant, args.epochs, root, scp, eval_scp,
                      eval_utts, False)
    print(json.dumps({"variant": args.variant,
                      "stage": f"trained-{args.epochs}ep",
                      "eer": round(trained_eer, 4),
                      "improvement": round(init_eer - trained_eer, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
