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


def ssl_voice(rng, n, formants, f0=None):
    """A 'speaker' is a fixed pair of formant-like resonances
    ``formants = (c1, c2)`` in Hz shaping a harmonic excitation.

    CRITICAL corpus properties for SSL (both measured):
    - the pitch must WANDER WITHIN each utterance (slow +-0.5-octave LFO),
      so 1-2 s crops of the same utterance differ in f0 and the only
      crop-invariant feature left for DINO/SDPN-style objectives is the
      speaker timbre. With constant per-utterance f0, crop-invariance is
      satisfied by encoding pitch — speaker-independent by design — and
      trained EER stayed at chance (0.48-0.50).
    - identity must live in pitch-invariant FORMANT positions, not in raw
      harmonic-index weights: with random positive weight vectors even the
      SUPERVISED probe only reached 39.8% held-out EER (signatures too
      similar, E[cos] ~ 0.75 in the positive orthant)."""
    t = np.arange(n) / FS
    if f0 is None:
        f0 = rng.uniform(110.0, 240.0)
    lfo = rng.uniform(0.2, 0.5)
    f_t = f0 * 2.0 ** (0.5 * np.sin(2 * np.pi * lfo * t
                                    + rng.uniform(0, 6.28)))
    # cumulative phase (n ~ 1e5: fine even with this numpy's scalar cumsum)
    phase = 2 * np.pi * np.cumsum(f_t) / FS
    c1, c2 = formants
    sig = np.zeros(n)
    for h in range(1, 13):
        fh = h * f_t  # the harmonic's instantaneous frequency
        a_h = (np.exp(-0.5 * ((fh - c1) / (0.18 * c1)) ** 2)
               + 0.7 * np.exp(-0.5 * ((fh - c2) / (0.12 * c2)) ** 2)
               + 0.05 / h)
        sig += a_h * np.sin(h * phase + rng.uniform(0, 6.28))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(2.0, 4.0) * t
                            + rng.uniform(0, 6.28))
    x = 0.25 * am * sig / (np.abs(sig).max() + 1e-6) * 3.0
    return (x + 0.01 * rng.standard_normal(n)).astype(np.float32)


def speaker_weights(rng, k):
    """k well-separated formant pairs (c1 in 350-1100 Hz, c2 in
    1300-3600 Hz), Latin-square-ish so neighbors differ in both."""
    c1s = np.linspace(350.0, 1100.0, k)
    c2s = np.linspace(1300.0, 3600.0, k)
    perm = rng.permutation(k)
    return [(float(c1s[i]), float(c2s[perm[i]])) for i in range(k)]


def build_corpus(root, n_spk, n_utt, n_eval_spk=4, n_eval_utt=6, seed=7):
    """Train scp (unlabeled, SSL) + TWO eval sets:
    - closed-set: NEW utterances of the train speakers (the toy-scale
      learning gate — generalization to unseen timbres needs far more than
      8 train speakers, measured 37% supervised open-set EER);
    - open-set: held-out speakers whose formants INTERLEAVE the train
      speakers' range (reported, not gated)."""
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(seed)
    k = n_spk + n_eval_spk
    slots = speaker_weights(rng, k)
    # interleave: eval speakers sit inside the train range, not past it
    eval_idx = set(np.linspace(1, k - 2, n_eval_spk).astype(int).tolist())
    train_f = [slots[i] for i in range(k) if i not in eval_idx]
    eval_f = [slots[i] for i in sorted(eval_idx)]

    scp = os.path.join(root, "train.scp")
    with open(scp, "w") as f:
        for s in range(n_spk):
            for u in range(n_utt):
                p = os.path.join(root, f"tr_s{s}_u{u}.wav")
                write_wav(p, ssl_voice(rng, 5 * FS, train_f[s]), FS)
                f.write(f"tr_s{s}_u{u} {p}\n")

    closed_scp = os.path.join(root, "eval_closed.scp")
    closed_utts = []
    with open(closed_scp, "w") as f:
        for s in range(n_spk):
            for u in range(n_eval_utt):
                uid = f"cl_s{s}_u{u}"
                p = os.path.join(root, f"{uid}.wav")
                write_wav(p, ssl_voice(rng, 3 * FS, train_f[s]), FS)
                f.write(f"{uid} {p}\n")
                closed_utts.append((uid, s))

    open_scp = os.path.join(root, "eval_open.scp")
    open_utts = []
    with open(open_scp, "w") as f:
        for s in range(n_eval_spk):
            for u in range(n_eval_utt):
                uid = f"ev_s{s}_u{u}"
                p = os.path.join(root, f"{uid}.wav")
                write_wav(p, ssl_voice(rng, 3 * FS, eval_f[s]), FS)
                f.write(f"{uid} {p}\n")
                open_utts.append((uid, s))
    return scp, (closed_scp, closed_utts), (open_scp, open_utts)


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


def run(variant, epochs, root, scp, evals, probe_init):
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
        "lr": float(os.environ.get("SSL_PROBE_LR", 0.5)), "n_mels": 80,
        # teacher EMA momentum must scale with the toy step count: at the
        # production 0.996 the teacher (what extract_ssl embeds with)
        # moves <25% of the way to the student in ~60 steps — measured
        # no-learning at 0.996 (EER 0.495 vs init 0.483)
        "momentum_teacher": float(os.environ.get("SSL_PROBE_MT", 0.7)),
        "embedding_dim": 64, "out_dim": 256, "add_dim": 64,
        "bottleneck_dim": 32,
        "num_proto": int(os.environ.get("SSL_PROBE_PROTO", 32)),
        "output_dim": 64,
        "channels": [64, 64, 64, 64, 192],
    }
    cfg_path = os.path.join(root, f"cfg_{variant}_{tag}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    ssl_main(["--config", cfg_path, "--variant", variant])
    out = {}
    for name, (eval_scp, eval_utts) in evals.items():
        emb_dir = os.path.join(exp, f"embs_{name}")
        ex_main(["--exp_dir", exp, "--data", eval_scp, "--out_dir", emb_dir,
                 "--variant", variant])
        out[name] = eer_from_embs(emb_dir, eval_utts)
    return out


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
    scp, closed, open_ = build_corpus(root, args.spk, args.utt)
    evals = {"closed": closed, "open": open_}

    init_eer = run(args.variant, 0, root, scp, evals, True)
    print(json.dumps({"variant": args.variant, "stage": "random-init",
                      "eer": {k: round(v, 4) for k, v in init_eer.items()}}),
          flush=True)
    trained_eer = run(args.variant, args.epochs, root, scp, evals, False)
    print(json.dumps({"variant": args.variant,
                      "stage": f"trained-{args.epochs}ep",
                      "eer": {k: round(v, 4)
                              for k, v in trained_eer.items()},
                      "improvement_closed": round(
                          init_eer["closed"] - trained_eer["closed"], 4)}),
          flush=True)


if __name__ == "__main__":
    main()
