"""Verification eval oracle tests.

Cross-checks the vectorized implementation against (a) a literal
re-implementation of the reference's loop-based math
(reference: deep_insight_face/evaluation/utility.py:36-171) and
(b) sklearn/scipy where applicable.
"""

import math

import numpy as np
import pytest

from deep_insight_face_tpu.evaluation import verification as V


def _ref_distance(e1, e2, metric):
    if metric == 0:
        diff = e1 - e2
        return np.sum(np.square(diff), 1)
    dot = np.sum(e1 * e2, axis=1)
    norm = np.linalg.norm(e1, axis=1) * np.linalg.norm(e2, axis=1)
    return np.arccos(np.clip(dot / norm, -1, 1)) / math.pi


def _ref_accuracy(threshold, dist, issame):
    pred = np.less(dist, threshold)
    tp = np.sum(np.logical_and(pred, issame))
    fp = np.sum(np.logical_and(pred, np.logical_not(issame)))
    tn = np.sum(np.logical_and(np.logical_not(pred), np.logical_not(issame)))
    fn = np.sum(np.logical_and(np.logical_not(pred), issame))
    tpr = 0 if (tp + fn == 0) else float(tp) / float(tp + fn)
    fpr = 0 if (fp + tn == 0) else float(fp) / float(fp + tn)
    acc = float(tp + tn) / dist.size
    return tpr, fpr, acc


def _make_pairs(rng, n_pairs=120, dim=16, sep=1.0, normalize=False):
    """Synthetic embeddings with controllable same/diff separation."""
    issame = rng.random(n_pairs) < 0.5
    anchors = rng.normal(size=(n_pairs, dim))
    noise = rng.normal(size=(n_pairs, dim)) * 0.3
    partners = np.where(issame[:, None], anchors + noise, anchors + noise + sep)
    if normalize:
        # unit-norm → squared euclidean ∈ [0, 4], the reference's threshold range
        anchors = anchors / np.linalg.norm(anchors, axis=1, keepdims=True)
        partners = partners / np.linalg.norm(partners, axis=1, keepdims=True)
    return anchors, partners, issame


def test_pair_distances_match_reference(rng):
    e1 = rng.normal(size=(50, 8))
    e2 = rng.normal(size=(50, 8))
    for metric in (0, 1):
        np.testing.assert_allclose(
            V.pair_distances(e1, e2, metric), _ref_distance(e1, e2, metric), atol=1e-12
        )


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold

    for n, k in [(100, 10), (103, 10), (47, 5)]:
        ours = V.kfold_indices(n, k)
        theirs = list(KFold(n_splits=k, shuffle=False).split(np.arange(n)))
        assert len(ours) == len(theirs)
        for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
            np.testing.assert_array_equal(tr_a, tr_b)
            np.testing.assert_array_equal(te_a, te_b)


def test_calculate_accuracy_matches_reference(rng):
    e1, e2, issame = _make_pairs(rng)
    dist = V.pair_distances(e1, e2, 0)
    for thr in [0.0, 0.5, 1.0, 2.0, 4.0]:
        tpr, fpr, acc, _ = V.calculate_accuracy(thr, dist, issame)
        rtpr, rfpr, racc = _ref_accuracy(thr, dist, issame)
        assert (tpr, fpr, acc) == pytest.approx((rtpr, rfpr, racc))


def _ref_calculate_roc(thresholds, e1, e2, issame, nrof_folds, metric, subtract_mean):
    """Literal port of the reference fold/threshold loops (utility.py:122-171)."""
    from sklearn.model_selection import KFold

    n = len(issame)
    k_fold = KFold(n_splits=nrof_folds, shuffle=False)
    tprs = np.zeros((nrof_folds, len(thresholds)))
    fprs = np.zeros((nrof_folds, len(thresholds)))
    accuracy = np.zeros(nrof_folds)
    for fold_idx, (train, test) in enumerate(k_fold.split(np.arange(n))):
        mean = (
            np.mean(np.concatenate([e1[train], e2[train]]), axis=0)
            if subtract_mean
            else 0.0
        )
        dist = _ref_distance(e1 - mean, e2 - mean, metric)
        acc_train = np.array(
            [_ref_accuracy(t, dist[train], issame[train])[2] for t in thresholds]
        )
        best = np.argmax(acc_train)
        for ti, t in enumerate(thresholds):
            tprs[fold_idx, ti], fprs[fold_idx, ti], _ = _ref_accuracy(
                t, dist[test], issame[test]
            )
        accuracy[fold_idx] = _ref_accuracy(thresholds[best], dist[test], issame[test])[2]
    return tprs.mean(0), fprs.mean(0), accuracy


@pytest.mark.parametrize("metric", [0, 1])
@pytest.mark.parametrize("subtract_mean", [False, True])
def test_calculate_roc_matches_reference(rng, metric, subtract_mean):
    e1, e2, issame = _make_pairs(rng, n_pairs=200)
    thresholds = np.arange(0, 4, 0.05)
    tpr, fpr, acc, _, _ = V.calculate_roc(
        thresholds, e1, e2, issame, nrof_folds=10,
        distance_metric=metric, subtract_mean=subtract_mean,
    )
    rtpr, rfpr, racc = _ref_calculate_roc(
        thresholds, e1, e2, issame, 10, metric, subtract_mean
    )
    np.testing.assert_allclose(tpr, rtpr, atol=1e-12)
    np.testing.assert_allclose(fpr, rfpr, atol=1e-12)
    np.testing.assert_allclose(acc, racc, atol=1e-12)


def test_calculate_val_reasonable(rng):
    # well-separated pairs → TAR@FAR should be ~1
    e1, e2, issame = _make_pairs(rng, n_pairs=500, sep=2.0)
    thresholds = np.arange(0, 100, 0.01)
    val, val_std, far = V.calculate_val(
        thresholds, e1, e2, issame, far_target=1e-3, nrof_folds=10
    )
    assert val > 0.9
    assert far <= 0.05


def test_evaluate_end_to_end(rng):
    e1, e2, issame = _make_pairs(rng, n_pairs=300, sep=3.0, normalize=True)
    emb = np.empty((600, e1.shape[1]))
    emb[0::2] = e1
    emb[1::2] = e2
    report = V.evaluate(emb, issame)
    assert report.accuracy_mean > 0.9
    assert 0.0 <= report.eer <= 0.2
    assert report.auc > 0.9
    assert "accuracy" in report.summary()


def test_eer_auc_against_scipy(rng):
    e1, e2, issame = _make_pairs(rng, n_pairs=400, sep=1.5, normalize=True)
    emb = np.empty((800, e1.shape[1]))
    emb[0::2] = e1
    emb[1::2] = e2
    report = V.evaluate(emb, issame)

    from scipy import interpolate
    from scipy.optimize import brentq
    from sklearn.metrics import auc as sk_auc

    order = np.argsort(report.fpr, kind="stable")
    fpr, tpr = report.fpr[order], report.tpr[order]
    # dedupe x for interp1d
    fpr_u, idx = np.unique(fpr, return_index=True)
    tpr_u = tpr[idx]
    ref_eer = brentq(lambda x: 1.0 - x - interpolate.interp1d(fpr_u, tpr_u)(x), 0.0, 1.0)
    assert report.eer == pytest.approx(ref_eer, abs=2e-2)
    assert report.auc == pytest.approx(sk_auc(fpr, tpr), abs=1e-9)


def test_confusion_matrix_formatting(rng):
    e1, e2, issame = _make_pairs(rng)
    dist = V.pair_distances(e1, e2, 0)
    s = V.format_confusion_matrix(dist, issame, 1.0)
    assert "TOTAL TP=" in s and "threshold=1.0000" in s


def test_verification_pairs_shapes_and_balance(rng):
    labels = np.repeat(np.arange(5), 4)  # 5 ids × 4 samples
    e1, e2, issame = V.verification_pairs(
        labels, np.random.default_rng(0), same_per_id=3, impostors_per_id=3
    )
    assert len(e1) == len(e2) == len(issame) == 5 * 6
    assert issame.sum() == 15
    for a, b, s in zip(e1, e2, issame):
        assert (labels[a] == labels[b]) == bool(s)


def test_verification_pairs_rejects_single_identity_impostors():
    # regression: one identity + impostors_per_id hit rng.choice([]) deep
    # inside numpy; <2 identities + impostors_total hit choice(n=2) — both
    # must fail with a clear message instead
    one_id = np.zeros(4, int)
    with pytest.raises(ValueError, match="identities"):
        V.verification_pairs(one_id, np.random.default_rng(0),
                             same_per_id=2, impostors_per_id=2)
    with pytest.raises(ValueError, match="identities"):
        V.verification_pairs(one_id, np.random.default_rng(0),
                             same_per_id=2, impostors_total=2)
    # genuine-only pairs over one identity remain legal
    e1, e2, issame = V.verification_pairs(
        one_id, np.random.default_rng(0), same_per_id=2
    )
    assert issame.all() and len(e1) == 2
