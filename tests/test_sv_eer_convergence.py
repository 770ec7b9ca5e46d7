"""SV EER convergence gate: the real training CLI must LEARN speaker
discrimination, not just step and match torch numerics.

Closed loop through the real CLI surfaces (reference pipeline:
egs/3dspeaker/sv-eres2netv2/run.sh stages 3-6): cli/train a tiny-but-real
backbone on synthetic voices -> cli/extract embeddings for utterances of
HELD-OUT speakers -> cli/compute_score_metrics on a same/different trial
list. Gate: EER far below the 50% chance level, and the large-margin
finetune stage (6 s crops, fixed margin 0.5, warm start, low LR — reference
run.sh:40-50) must not regress it.

Backbone choice (measured, r3): the gate trains an Xvector (held-out-
speaker EER 0.0 at this scale). A reduced ERes2NetV2 was tried first and
CANNOT discharge this gate at toy scale: its TSTP-pooled embedding carries
a dominant shared direction that pins all pairwise cosines at ~1.0 in
float32 even at train accuracy 1.0 (12 ep: closed-set EER 0.33 / open-set
0.45; 24 ep: 0.53 / 0.50 — MORE training deepens the collapse; embedding
mean subtraction does not recover it). r5 closed the loop on the other
side: the REFERENCE'S OWN torch trainer (speakerlab ERes2NetV2 +
ArcMarginLoss + schedulers, bin/train.py loop semantics) collapses
identically on the same corpus — within-minus-cross cosine gap 0.0006
(m16) / 0.0007 (m32); tools/ref_collapse_check.py, docs/PARITY.md. The
collapse is an architecture-at-toy-scale property, not a bug in our
train path. The flagship architecture's correctness is gated elsewhere
(weight-for-weight torch parity + trained-model pipeline equivalence);
learning-at-scale is what this file pins, on the backbone that can
express it. Numbers recorded in docs/PARITY.md ("SV EER convergence"
row).
"""

import os
import re

import numpy as np
import pytest

FS = 16000

TRAIN_F0S = [105.0, 140.0, 175.0, 210.0, 245.0, 280.0, 315.0, 350.0]
EVAL_F0S = [120.0, 190.0, 260.0, 330.0]  # unseen speakers inside the range


def _voice(rng, n, f0):
    """Same synthetic 'speaker' family as tools/eval_diar_synthetic.py."""
    t = np.arange(n) / FS
    f = f0 * (1 + 0.015 * rng.standard_normal())
    sig = (np.sin(2 * np.pi * f * t) + 0.5 * np.sin(2 * np.pi * 2 * f * t)
           + 0.25 * np.sin(2 * np.pi * 3 * f * t))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t + rng.uniform(0, 6.28))
    return (0.3 * am * sig + 0.004 * rng.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def sv_corpus(tmp_path_factory):
    from speaker3d_tpu.utils.fileio import write_wav

    root = str(tmp_path_factory.mktemp("sv_eer"))
    rng = np.random.default_rng(11)

    # train split: 8 speakers x 10 utts x 7 s (supports the 6 s LM crops)
    rows = []
    for s, f0 in enumerate(TRAIN_F0S):
        for u in range(10):
            p = f"{root}/tr_spk{s}_u{u}.wav"
            write_wav(p, _voice(rng, 7 * FS, f0), FS)
            rows.append((f"tr_spk{s}_u{u}", p, f"spk{s}"))
    csv = f"{root}/train.csv"
    with open(csv, "w") as f:
        f.write("ID,wav,spk\n")
        f.writelines(f"{a},{b},{c}\n" for a, b, c in rows)

    # eval split: 4 HELD-OUT speakers x 6 utts x 3 s
    scp = f"{root}/eval_wav.scp"
    utts = []
    with open(scp, "w") as f:
        for s, f0 in enumerate(EVAL_F0S):
            for u in range(6):
                uid = f"ev_spk{s}_u{u}"
                p = f"{root}/{uid}.wav"
                write_wav(p, _voice(rng, 3 * FS, f0), FS)
                f.write(f"{uid} {p}\n")
                utts.append((uid, s))

    # all-pairs trial list: `enrol test {1|0}`
    trials = f"{root}/trials.txt"
    with open(trials, "w") as f:
        for i in range(len(utts)):
            for j in range(i + 1, len(utts)):
                y = int(utts[i][1] == utts[j][1])
                f.write(f"{utts[i][0]} {utts[j][0]} {y}\n")
    return root, csv, scp, trials


MODEL = {"obj": "speaker3d_tpu.models.xvector.Xvector",
         "args": {"feat_dim": 80, "hid_dim": 16, "stats_dim": 32,
                  "embed_dim": 16}}


def _train(exp_dir, csv, **overrides):
    import yaml

    from speaker3d_tpu.cli.train import main as train_main

    cfg = {"exp_dir": exp_dir, "data": csv, "wav_len": 3.0,
           "speed_pertub": False, "aug_prob": 0.0, "batch_size": 16,
           "num_workers": 2, "num_epoch": 12, "embedding_size": 16,
           "max_lr": 0.1, "min_lr": 0.01, "warmup_epoch": 2,
           "log_batch_freq": 5, "increase_start_epoch": 3,
           "margin_fix_epoch": 8, "model": MODEL}
    cfg.update(overrides)
    cfg_path = os.path.join(os.path.dirname(exp_dir), "cfg_"
                            + os.path.basename(exp_dir) + ".yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config", cfg_path])


def _score(root, exp_dir, scp, trials, tag):
    from speaker3d_tpu.cli.compute_score_metrics import main as score_main
    from speaker3d_tpu.cli.extract import main as extract_main

    emb_dir = f"{root}/emb_{tag}"
    extract_main(["--exp_dir", exp_dir, "--data", scp,
                  "--out_dir", emb_dir, "--mode", "exact"])
    scores_dir = f"{root}/scores_{tag}"
    score_main(["--enrol_data", emb_dir, "--test_data", emb_dir,
                "--scores_dir", scores_dir, "--trials", trials])
    text = open(os.path.join(scores_dir, "result.metrics")).read()
    m = re.search(r"EER = ([0-9.]+)", text)
    assert m, text
    return float(m.group(1)) / 100.0


@pytest.mark.slow
def test_sv_eer_convergence_and_lm_finetune(sv_corpus):
    root, csv, scp, trials = sv_corpus

    base_exp = f"{root}/exp_base"
    _train(base_exp, csv)
    base_eer = _score(root, base_exp, scp, trials, "base")
    # chance is 50%; a learned embedding space must rank held-out-speaker
    # trials far better than that
    assert base_eer < 0.15, f"base EER {base_eer:.3f}"

    # large-margin finetune (reference egs/3dspeaker/sv-eres2netv2/run.sh:
    # 40-50: warm start from the base checkpoint, 6 s crops, margin fixed
    # at 0.5, LR 1e-4)
    lm_exp = f"{root}/exp_lm"
    _train(lm_exp, csv, init_exp_dir=base_exp, wav_len=6.0, num_epoch=4,
           max_lr=1e-4, min_lr=1e-5, warmup_epoch=1,
           initial_margin=0.5, final_margin=0.5,
           increase_start_epoch=1, margin_fix_epoch=2)
    lm_eer = _score(root, lm_exp, scp, trials, "lm")
    # run-to-run spread at this toy scale is ~2% absolute (measured LM EER
    # 0.0-1.9% across runs with base ~1.7%), so the no-regress gate allows
    # that noise while still pinning "far below chance"
    assert lm_eer <= base_eer + 0.05 and lm_eer < 0.15, (
        f"LM finetune regressed EER: {base_eer:.3f} -> {lm_eer:.3f}")

    print(f"base EER {base_eer:.4f}, LM EER {lm_eer:.4f}")
