"""Metrics golden tests vs sklearn and a literal port of the reference math."""

import numpy as np
import pytest
import sklearn.metrics as skm

from speakerverification_tpu.evaluation import metrics as M


@pytest.fixture()
def trial_scores():
    rng = np.random.default_rng(0)
    n = 2000
    labels = rng.integers(0, 2, n)
    scores = rng.normal(0, 1, n) + labels * 1.5
    return scores, labels


def test_roc_curve_matches_sklearn(trial_scores):
    scores, labels = trial_scores
    fpr, tpr, thr = M.roc_curve(labels, scores)
    fpr_s, tpr_s, thr_s = skm.roc_curve(labels, scores, pos_label=1)
    np.testing.assert_allclose(fpr, fpr_s)
    np.testing.assert_allclose(tpr, tpr_s)
    # sklearn>=1.3 uses thresholds[0]=inf too; compare the finite tail
    np.testing.assert_allclose(thr[1:], thr_s[1:])


def test_precision_recall_matches_sklearn(trial_scores):
    scores, labels = trial_scores
    p, r, t = M.precision_recall_curve(labels, scores)
    p_s, r_s, t_s = skm.precision_recall_curve(labels, scores, pos_label=1)
    # sklearn trims the curve after full recall; compare the shared prefix
    n = min(len(p), len(p_s))
    np.testing.assert_allclose(r[-n:], r_s[-n:])
    np.testing.assert_allclose(p[-n:], p_s[-n:])


def test_tune_threshold_reference_parity(trial_scores):
    """Compare against a literal numpy port of src/utils.py:74-121."""
    scores, labels = trial_scores
    res = M.tune_threshold_from_score(scores, labels, [1.0], [10.0])

    fpr, tpr, thresholds = skm.roc_curve(labels, scores, pos_label=1)
    fnr = (1 - tpr) * 100
    fpr_pct = fpr * 100
    idx_e = np.nanargmin(np.absolute(fnr - fpr_pct))
    eer_ref = np.mean([fpr_pct[idx_e], fnr[idx_e]])
    assert res["roc"][1] == pytest.approx(eer_ref, abs=1e-12)

    auc_ref = skm.auc(fpr_pct, tpr)
    assert res["roc"][2] == pytest.approx(auc_ref, rel=1e-12)

    gmean = np.sqrt(tpr * (1 - fpr))
    idx_g = np.argmax(gmean)
    assert res["gmean"][1] == pytest.approx(gmean[idx_g])


def test_compute_error_rates_reference_parity(trial_scores):
    """Vectorized compute_error_rates vs the reference's O(n) loop
    (src/utils.py:221-256)."""
    scores, labels = trial_scores
    scores = scores[:500]
    labels = labels[:500].astype(float)

    fnrs, fprs, thr = M.compute_error_rates(scores, labels)

    order = sorted(range(len(scores)), key=lambda i: scores[i])
    slabels = [labels[i] for i in order]
    fnrs_ref, fprs_ref = [], []
    for i in range(len(slabels)):
        if i == 0:
            fnrs_ref.append(slabels[i])
            fprs_ref.append(1 - slabels[i])
        else:
            fnrs_ref.append(fnrs_ref[i - 1] + slabels[i])
            fprs_ref.append(fprs_ref[i - 1] + 1 - slabels[i])
    n_pos = sum(slabels)
    n_neg = len(slabels) - n_pos
    fnrs_ref = [x / n_pos for x in fnrs_ref]
    fprs_ref = [1 - x / n_neg for x in fprs_ref]

    np.testing.assert_allclose(fnrs, fnrs_ref, atol=1e-12)
    np.testing.assert_allclose(fprs, fprs_ref, atol=1e-12)


def test_min_dcf(trial_scores):
    scores, labels = trial_scores
    fnrs, fprs, thr = M.compute_error_rates(scores, labels)
    mindcf, mindcf_thr = M.compute_min_dcf(fnrs, fprs, thr,
                                           p_target=0.05, c_miss=1, c_fa=1)
    # brute-force oracle (src/utils.py:262-275 loop)
    best, best_t = float("inf"), thr[0]
    for fn, fp, t in zip(fnrs, fprs, thr):
        c = 1 * fn * 0.05 + 1 * fp * 0.95
        if c < best:
            best, best_t = c, t
    best /= min(0.05, 0.95)
    assert mindcf == pytest.approx(best)
    assert mindcf_thr == pytest.approx(best_t)


def test_accuracy_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.4, 0.3, 0.5]])
    target = np.array([1, 0, 0])
    top1, top2 = M.accuracy(logits, target, topk=(1, 2))
    assert top1 == pytest.approx(100 * 2 / 3)
    assert top2 == pytest.approx(100.0)


def test_perfect_separation_eer_zero():
    labels = np.array([0] * 50 + [1] * 50)
    scores = np.concatenate([np.linspace(-2, -1, 50), np.linspace(1, 2, 50)])
    res = M.tune_threshold_from_score(scores, labels, [1.0])
    assert res["roc"][1] == pytest.approx(0.0)
