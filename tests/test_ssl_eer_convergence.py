"""SSL learning gate: real train_ssl must IMPROVE speaker separation over
the random-init teacher (VERDICT r4 item 3).

Closed loop through the real CLI surfaces (reference behavior being
modeled: egs/voxceleb/sv-sdpn — SDPN reaches 1.80% EER from scratch;
speakerlab/bin/train_sdpn.py): train_ssl (SDPN) on unlabeled synthetic
voices -> extract_ssl with the teacher backbone -> EER on new utterances.

Corpus design (measured in tools/ssl_learn_probe.py — both properties are
REQUIRED, earlier variants stayed at chance): speaker identity lives in
formant-like resonance positions (pitch-invariant), and the pitch wanders
within each utterance so crop-invariance cannot be satisfied by encoding
f0. Toy-scale config notes: teacher EMA momentum is lowered to 0.7 (at the
production 0.996 the teacher — what extract_ssl embeds with — moves <25%
of the way to the student in the ~160 steps this gate trains).

Measured (2026-08-21, sdpn 20 ep, 8 spk x 16 utt): random-init closed-set
EER 0.375 / open 0.310 -> trained closed 0.241 / open 0.233. Gate pins the
closed-set improvement with headroom for run-to-run noise; open-set is
reported but not gated (generalizing to unseen timbres from 8 train
speakers is weak even supervised — probe measured 16.2%).
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_ssl_training_improves_speaker_separation(tmp_path):
    from tools.ssl_learn_probe import build_corpus, run

    os.environ.setdefault("SSL_PROBE_LR", "0.5")
    os.environ.setdefault("SSL_PROBE_MT", "0.7")
    os.environ.setdefault("SSL_PROBE_PROTO", "32")

    root = str(tmp_path)
    scp, closed, open_ = build_corpus(root, n_spk=8, n_utt=16)
    evals = {"closed": closed, "open": open_}

    init_eer = run("sdpn", 0, root, scp, evals, probe_init=True)
    trained_eer = run("sdpn", 20, root, scp, evals, probe_init=False)
    print(json.dumps({"init": init_eer, "trained": trained_eer}))

    # the baseline must be genuinely weak, else the gate is vacuous
    assert init_eer["closed"] >= 0.28, init_eer
    # material improvement (measured 0.134; gate at 0.04 leaves ~3x
    # headroom for toy-scale noise) AND a real absolute level (measured
    # 0.241; chance is 0.50)
    assert init_eer["closed"] - trained_eer["closed"] >= 0.04, (
        init_eer, trained_eer)
    assert trained_eer["closed"] <= 0.34, trained_eer
