"""Print which BASELINE accuracy gates are dischargeable in this container.

"204 tests passed" must never quietly absorb "the accuracy gates were
skipped" (VERDICT r1 item 10): the three north-star gates need external
assets (pretrained checkpoints, eval corpora) that a zero-egress container
does not have. This tool makes the gate state explicit — run it alongside
the test suite and paste its output into round reports.

Usage: python tools/gate_status.py  (CPU-safe, no jax import)
"""

from __future__ import annotations

import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GREEN, YELLOW, RED = "PASS (in-container)", "PENDING (needs assets)", "MISSING"


def _find_pretrained():
    from speaker3d_tpu.cli.registry import SUPPORTS

    found = []
    for root in [os.path.join(REPO, "pretrained"),
                 "/root/reference/save_eres2netv2w24s4ep4/pretrained"]:
        for model_id, spec in SUPPORTS.items():
            for pat in [os.path.join(root, model_id, spec["model_pt"]),
                        os.path.join(root, "*", model_id, spec["model_pt"])]:
                found += glob.glob(pat)
    return sorted(set(found))


def _find_corpus(names):
    hits = []
    for base in ["/data", "/corpora", os.path.join(REPO, "data_raw"),
                 os.path.expanduser("~/corpora")]:
        for n in names:
            p = os.path.join(base, n)
            if os.path.isdir(p):
                hits.append(p)
    return hits


def main():
    rows = []

    # Gate 1: checkpoint conversion parity (<=1e-3 cosine drift)
    ckpts = _find_pretrained()
    rows.append((
        "ckpt-parity (cosine drift <=1e-3 vs reference weights)",
        GREEN if ckpts else YELLOW,
        f"{len(ckpts)} checkpoint(s) found — run tools/verify_pretrained.py "
        "and tests/test_pretrained_ckpt_parity.py" if ckpts else
        "no modelscope snapshot present; harness ready "
        "(tools/verify_pretrained.py, tests/test_pretrained_ckpt_parity.py "
        "auto-activates when a checkpoint appears under pretrained/)"))

    # Gate 2: VoxCeleb EER within 0.05% abs of the published tables
    vox = _find_corpus(["voxceleb1", "VoxCeleb1", "voxceleb", "vox1"])
    rows.append((
        "voxceleb-eer (abs diff <=0.05% vs BASELINE.md tables)",
        GREEN if (vox and ckpts) else YELLOW,
        "corpus+ckpt present — run egs/voxceleb/sv-eres2netv2/run.sh stages "
        "5-6" if (vox and ckpts) else
        "needs VoxCeleb1 audio + a trained/converted checkpoint; scoring "
        "path itself is tested in-container (tests/test_cli_e2e.py, "
        "tests/test_metrics.py)"))

    # Gate 3: diarization DER parity (AliMeeting / AMI)
    diar = _find_corpus(["alimeeting", "AliMeeting", "ami", "AMI"])
    rows.append((
        "diarization-der (AliMeeting/AMI parity vs BASELINE.md)",
        GREEN if (diar and ckpts) else YELLOW,
        "corpus present — run egs/3dspeaker/speaker-diarization/run_audio.sh"
        if (diar and ckpts) else
        "needs AliMeeting/AMI audio + reference RTTMs; DER scorer itself is "
        "oracle-tested vs NIST md-eval.pl (tests/test_der.py), synthetic "
        "DER measured by tools/eval_diar_synthetic.py (docs/PARITY.md)"))

    # In-container gates (discharged by the test suite)
    rows.append((
        "torch-parity (weight-for-weight forward parity, all models)",
        GREEN, "tests/test_*_parity.py vs /root/reference as oracle"))
    rows.append((
        "fbank-oracle (independent reference-C++ golden vectors)",
        GREEN, "tests/test_fbank_ref_oracle.py (frozen vectors in tests/data)"))
    rows.append((
        "multihost (2-process jax.distributed integration)",
        GREEN, "tests/test_multihost.py"))
    rows.append((
        "pipeline-equivalence (reference Diarization3Dspeaker, "
        "byte-identical RTTM)",
        GREEN, "tests/test_ref_pipeline_equiv.py — 3 seeds x {AHC, "
               "spectral} + trained-model multi-cluster path + "
               "include_overlap=True leg driving the reference's own "
               "post_process/binary_to_segs (r4)"))
    rows.append((
        "sv-eer-convergence (real train/extract/score CLIs, held-out "
        "speakers)",
        GREEN, "tests/test_sv_eer_convergence.py — base 1.7% EER + "
               "LM-finetune no-regress <= base + 5% abs (chance 50%). "
               "Caveat: the gate trains Xvector, NOT the flagship — tiny "
               "ERes2NetV2 provably collapses emb cosines at toy scale "
               "(measured r3; r5: the REFERENCE'S OWN torch trainer "
               "collapses identically on the same corpus, within-cross "
               "gap 0.0006/0.0007 at m16/m32 — tools/ref_collapse_check.py"
               ", docs/PARITY.md); flagship convergence is instead "
               "gated by torch parity + trained-model pipeline "
               "equivalence"))
    rows.append((
        "ssl-learning (trained teacher beats random-init baseline)",
        GREEN, "tests/test_ssl_eer_convergence.py — SDPN via real "
               "train_ssl/extract_ssl CLIs: closed-set EER 0.375 init -> "
               "0.23-0.24 trained (gate: improvement >= 0.04, absolute "
               "<= 0.34; corpus/momentum design notes in "
               "tools/ssl_learn_probe.py)"))

    width = max(len(r[0]) for r in rows)
    print("BASELINE gate status")
    print("=" * 74)
    pending = 0
    for name, status, detail in rows:
        pending += status != GREEN
        print(f"{name:<{width}}  [{status}]")
        print(f"{'':<{width}}  {detail}")
    print("=" * 74)
    print(f"{len(rows) - pending}/{len(rows)} gates dischargeable "
          f"in-container; {pending} pending external assets")
    return 0


if __name__ == "__main__":
    sys.exit(main())
