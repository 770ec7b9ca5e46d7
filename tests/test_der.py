import os

import numpy as np

from speaker3d_tpu.diar.der import (
    compute_der,
    compute_der_for_files,
    load_rttm,
)


def test_der_perfect():
    ref = [(0, 10, "A"), (10, 20, "B")]
    hyp = [(0, 10, "x"), (10, 20, "y")]
    r = compute_der(ref, hyp, collar=0.0)
    assert r.der == 0.0
    assert r.total == 20.0


def test_der_permutation_invariant():
    ref = [(0, 10, "A"), (10, 20, "B")]
    hyp = [(0, 10, "y"), (10, 20, "x")]
    assert compute_der(ref, hyp, collar=0.0).der == 0.0


def test_der_miss_and_fa():
    ref = [(0, 10, "A")]
    hyp = [(0, 8, "x")]  # 2s missed
    r = compute_der(ref, hyp, collar=0.0)
    assert abs(r.miss - 2.0) < 1e-9 and r.fa == 0 and r.spkerr == 0
    assert abs(r.der - 0.2) < 1e-9

    # hyp beyond the reference span is NOT scored by default (md-eval
    # derives the evaluation region from the reference, uem_from_rttm)
    hyp = [(0, 12, "x")]
    r = compute_der(ref, hyp, collar=0.0)
    assert r.fa == 0 and r.der == 0.0
    # an explicit evaluation region restores the false alarm
    r = compute_der(ref, hyp, collar=0.0, uem=(0.0, 12.0))
    assert abs(r.fa - 2.0) < 1e-9
    assert abs(r.der - 0.2) < 1e-9


def test_der_speaker_error():
    ref = [(0, 10, "A"), (10, 20, "B")]
    hyp = [(0, 12, "x"), (12, 20, "y")]  # 2s of B labeled as x
    r = compute_der(ref, hyp, collar=0.0)
    assert abs(r.spkerr - 2.0) < 1e-9
    assert abs(r.der - 0.1) < 1e-9


def test_der_collar_absorbs_boundary_error():
    ref = [(0, 10, "A"), (10, 20, "B")]
    hyp = [(0, 10.2, "x"), (10.2, 20, "y")]
    assert compute_der(ref, hyp, collar=0.0).der > 0
    assert compute_der(ref, hyp, collar=0.25).der == 0.0


def test_der_overlap_miss():
    ref = [(0, 10, "A"), (5, 10, "B")]  # 5s overlap
    hyp = [(0, 10, "x")]
    r = compute_der(ref, hyp, collar=0.0)
    # 5s of overlapped B speech missed; total ref speaker time = 15s
    assert abs(r.miss - 5.0) < 1e-9
    assert abs(r.total - 15.0) < 1e-9
    # ignore_overlap mode scores only single-speaker regions
    r2 = compute_der(ref, hyp, collar=0.0, ignore_overlap=True)
    assert r2.der == 0.0


def test_rttm_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "test.rttm")
    with open(path, "w") as f:
        f.write("SPEAKER file1 0 0.000 5.000 <NA> <NA> 0 <NA> <NA>\n")
        f.write("SPEAKER file1 0 5.000 5.000 <NA> <NA> 1 <NA> <NA>\n")
        f.write("SPEAKER file2 0 1.000 2.000 <NA> <NA> 0 <NA> <NA>\n")
    segs = load_rttm(path)
    assert set(segs) == {"file1", "file2"}
    assert segs["file1"][0] == (0.0, 5.0, "0")
    r = compute_der_for_files(segs, segs, collar=0.0)
    assert r.der == 0.0


def _write_rttm(path, segs, uri="f1"):
    with open(path, "w") as f:
        for st, ed, spk in segs:
            f.write(f"SPEAKER {uri} 0 {st:.3f} {ed - st:.3f} "
                    f"<NA> <NA> {spk} <NA> <NA>\n")


def _md_eval(ref_path, hyp_path, collar):
    """Run the NIST md-eval.pl from the READ-ONLY reference as an oracle."""
    import re
    import subprocess

    script = ("/root/reference/egs/3dspeaker/speaker-diarization/local/"
              "md-eval.pl")
    out = subprocess.run(
        ["perl", script, "-c", str(collar), "-r", ref_path, "-s", hyp_path],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-1000:]
    m = re.search(r"OVERALL SPEAKER DIARIZATION ERROR = ([0-9.]+)",
                  out.stdout)
    assert m, out.stdout[-2000:]
    return float(m.group(1)) / 100.0


def test_der_matches_md_eval(tmp_path):
    """Randomized RTTMs: our native DER must match the NIST md-eval.pl
    scorer (the reference's DER backend) to within rounding, at collar 0
    and 0.25."""
    import pytest as _pytest

    if not os.path.exists("/root/reference/egs/3dspeaker/"
                          "speaker-diarization/local/md-eval.pl"):
        _pytest.skip("reference md-eval.pl not available")
    rng = np.random.default_rng(7)
    for trial in range(5):
        # reference: 2-3 speakers taking turns with small gaps
        ref, t = [], 0.0
        for _ in range(rng.integers(4, 9)):
            dur = float(rng.uniform(1.0, 6.0))
            spk = f"S{int(rng.integers(0, 3))}"
            ref.append((t, t + dur, spk))
            t += dur + float(rng.uniform(0.0, 1.0))
        # hypothesis: jittered boundaries, occasional wrong speaker / miss
        hyp = []
        for st, ed, spk in ref:
            if rng.random() < 0.15:
                continue  # miss
            j = float(rng.uniform(-0.4, 0.4))
            k = float(rng.uniform(-0.4, 0.4))
            spk_h = spk if rng.random() > 0.2 else f"S{int(rng.integers(0, 3))}"
            if ed + k - (st + j) > 0.2:
                hyp.append((st + j, ed + k, spk_h))
        if rng.random() < 0.5:  # false alarm region
            hyp.append((t + 1.0, t + 2.5, "S0"))

        for collar in (0.0, 0.25):
            ref_p = os.path.join(tmp_path, f"ref{trial}.rttm")
            hyp_p = os.path.join(tmp_path, f"hyp{trial}.rttm")
            _write_rttm(ref_p, ref)
            _write_rttm(hyp_p, hyp)
            want = _md_eval(ref_p, hyp_p, collar)
            # score the WRITTEN rttms so both scorers see identical
            # 3-decimal times
            got = compute_der(load_rttm(ref_p)["f1"],
                              load_rttm(hyp_p)["f1"], collar=collar).der
            assert got == _pytest.approx(want, abs=2e-3), (
                trial, collar, got, want)
