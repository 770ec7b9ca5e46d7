import numpy as np
import pytest

from speaker3d_tpu.utils.metrics import (
    accuracy,
    average_precision,
    compute_eer,
    compute_min_dcf,
)
from tests.conftest import has_reference


def _trials(n=20000, seed=0, sep=2.0):
    rng = np.random.default_rng(seed)
    labels = (rng.random(n) < 0.3).astype(int)
    scores = rng.standard_normal(n) + labels * sep
    return scores, labels


def test_eer_reasonable():
    scores, labels = _trials()
    eer = compute_eer(scores, labels)
    # two unit gaussians separated by 2 -> EER = Phi(-1) ~= 15.87%
    assert abs(eer - 0.1587) < 0.01


def test_eer_threshold():
    scores, labels = _trials()
    eer, thr = compute_eer(scores, labels, return_threshold=True)
    # threshold should sit near the midpoint of the two means
    assert 0.7 < thr < 1.3


def test_min_dcf_bounds():
    scores, labels = _trials()
    dcf = compute_min_dcf(scores, labels, p_target=0.01)
    assert 0.0 < dcf <= 1.0
    # perfect separation -> 0 cost
    scores2 = labels * 10.0
    assert compute_min_dcf(scores2, labels, p_target=0.01) < 1e-9


def test_accuracy():
    logits = np.array([[0.9, 0.1, 0.0], [0.2, 0.7, 0.1], [0.1, 0.8, 0.15]])
    targets = np.array([0, 1, 2])
    top1, top2 = accuracy(logits, targets, topk=(1, 2))
    assert abs(top1 - 66.667) < 0.1
    assert abs(top2 - 100.0) < 1e-6


def test_average_precision_perfect():
    labels = np.array([1, 1, 0, 0])
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    assert average_precision(labels, scores) == 1.0


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_metrics_match_reference_implementation():
    import sys

    sys.path.insert(0, "/root/reference")
    from speakerlab.utils.score_metrics import (
        compute_c_norm as ref_c_norm,
        compute_eer as ref_eer,
        compute_pmiss_pfa_rbst as ref_curve,
    )

    scores, labels = _trials(5000, seed=3)
    ref_fnr, ref_fpr = ref_curve(scores, labels)
    got_eer = compute_eer(scores, labels)
    want_eer = ref_eer(ref_fnr, ref_fpr)
    assert abs(got_eer - want_eer) < 1e-9
    got_dcf = compute_min_dcf(scores, labels, p_target=0.01)
    want_dcf = ref_c_norm(ref_fnr, ref_fpr, 0.01)
    assert abs(got_dcf - want_dcf) < 1e-9


def test_eer_degenerate_perfect_separation():
    """Perfectly separated tiny trial lists have no DET crossing; the
    reference formula raises IndexError there — we report 0 instead."""
    from speaker3d_tpu.utils.metrics import compute_eer

    scores = np.array([0.9, 0.1], dtype=np.float64)
    labels = np.array([1, 0])
    assert compute_eer(scores, labels) == 0.0
    eer, thr = compute_eer(scores, labels, return_threshold=True)
    assert eer == 0.0 and 0.1 <= thr <= 0.9
