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

    hyp = [(0, 12, "x")]  # 2s false alarm
    r = compute_der(ref, hyp, collar=0.0)
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
