"""LFW-protocol verification metrics — the framework's correctness oracle.

Implements the same protocol as the reference's evaluation suite
(reference: deep_insight_face/evaluation/utility.py:10-171 and
evaluation/evals.py:63-72): k-fold cross-validated ROC over a threshold
sweep, accuracy/F1 at the per-fold best train threshold, VAL/TAR at a
target FAR found by linear interpolation over a fine threshold sweep,
plus AUC and EER.

Unlike the reference (which loops Python-level over folds × thresholds ×
pairs), every threshold sweep here is a single broadcasted comparison —
``dist[None, :] < thresholds[:, None]`` — so the whole eval is a handful
of vectorized numpy ops per fold. The math is bit-identical.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

SQUARED_EUCLIDEAN = 0
ARCCOS_COSINE = 1


def pair_distances(
    embeddings1: np.ndarray,
    embeddings2: np.ndarray,
    distance_metric: int = SQUARED_EUCLIDEAN,
) -> np.ndarray:
    """Per-pair distance between two (N, D) embedding batches.

    metric 0: squared euclidean; metric 1: arccos(cosine similarity) / pi
    (reference: evaluation/utility.py:52-66).
    """
    e1 = np.asarray(embeddings1, dtype=np.float64)
    e2 = np.asarray(embeddings2, dtype=np.float64)
    if distance_metric == SQUARED_EUCLIDEAN:
        d = e1 - e2
        return np.einsum("nd,nd->n", d, d)
    if distance_metric == ARCCOS_COSINE:
        dot = np.einsum("nd,nd->n", e1, e2)
        norm = np.linalg.norm(e1, axis=1) * np.linalg.norm(e2, axis=1)
        sim = np.clip(dot / np.maximum(norm, 1e-12), -1.0, 1.0)
        return np.arccos(sim) / math.pi
    raise ValueError(f"Undefined distance metric {distance_metric}")


# ---------------------------------------------------------------------------
# k-fold split (sklearn KFold(shuffle=False) semantics, dependency-free)
# ---------------------------------------------------------------------------


def kfold_indices(n: int, n_folds: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Consecutive (train, test) index splits.

    Matches ``sklearn.model_selection.KFold(n_splits, shuffle=False)``:
    the first ``n % n_folds`` folds get one extra sample.
    """
    if n_folds < 2 or n_folds > n:
        raise ValueError(f"n_folds={n_folds} invalid for n={n}")
    sizes = np.full(n_folds, n // n_folds, dtype=np.int64)
    sizes[: n % n_folds] += 1
    indices = np.arange(n)
    splits = []
    start = 0
    for sz in sizes:
        test = indices[start : start + sz]
        train = np.concatenate([indices[:start], indices[start + sz :]])
        splits.append((train, test))
        start += sz
    return splits


# ---------------------------------------------------------------------------
# vectorized confusion stats
# ---------------------------------------------------------------------------


def _confusion_counts(
    dist: np.ndarray, issame: np.ndarray, thresholds: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """tp/fp/tn/fn, each (T,), from a single broadcasted comparison."""
    pred = dist[None, :] < thresholds[:, None]  # (T, N)
    same = issame[None, :]
    tp = np.sum(pred & same, axis=1)
    fp = np.sum(pred & ~same, axis=1)
    fn = np.sum(~pred & same, axis=1)
    tn = np.sum(~pred & ~same, axis=1)
    return tp, fp, tn, fn


def _safe_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    return np.where(den > 0, num / np.maximum(den, 1), 0.0)


def calculate_accuracy(
    threshold: float, dist: np.ndarray, actual_issame: np.ndarray
) -> Tuple[float, float, float, float]:
    """(tpr, fpr, accuracy, f1) at one threshold (reference: utility.py:36-49)."""
    tp, fp, tn, fn = (
        x[0] for x in _confusion_counts(dist, np.asarray(actual_issame, bool), np.array([threshold]))
    )
    tpr = float(_safe_div(tp, tp + fn))
    fpr = float(_safe_div(fp, fp + tn))
    acc = float(tp + tn) / dist.size
    precision = float(_safe_div(tp, tp + fp))
    recall = tpr
    f1 = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return tpr, fpr, acc, f1


def calculate_val_far(
    threshold: float, dist: np.ndarray, actual_issame: np.ndarray
) -> Tuple[float, float]:
    """(VAL, FAR) at one threshold (reference: utility.py:69-77)."""
    issame = np.asarray(actual_issame, bool)
    tp, fp, _, _ = (x[0] for x in _confusion_counts(dist, issame, np.array([threshold])))
    n_same = int(issame.sum())
    n_diff = int((~issame).sum())
    val = 0.0 if n_same == 0 else float(tp) / n_same
    far = 0.0 if n_diff == 0 else float(fp) / n_diff
    return val, far


# ---------------------------------------------------------------------------
# k-fold ROC / VAL@FAR
# ---------------------------------------------------------------------------


def _fold_mean(
    e1: np.ndarray, e2: np.ndarray, train: np.ndarray, subtract_mean: bool
) -> np.ndarray:
    if not subtract_mean:
        return np.zeros((1, e1.shape[1]))
    return np.mean(np.concatenate([e1[train], e2[train]]), axis=0, keepdims=True)


def calculate_roc(
    thresholds: np.ndarray,
    embeddings1: np.ndarray,
    embeddings2: np.ndarray,
    actual_issame: np.ndarray,
    nrof_folds: int = 10,
    distance_metric: int = SQUARED_EUCLIDEAN,
    subtract_mean: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """k-fold ROC sweep (reference: utility.py:122-171).

    Returns (tpr (T,), fpr (T,), accuracy (folds,), f1 (folds,),
    best_thresholds (folds,)). tpr/fpr are fold-averaged per threshold;
    accuracy/f1 are evaluated on each test fold at the threshold that
    maximizes train-fold accuracy.
    """
    thresholds = np.asarray(thresholds, dtype=np.float64)
    issame = np.asarray(actual_issame, bool)
    n = min(len(issame), embeddings1.shape[0])
    splits = kfold_indices(n, nrof_folds)

    tprs = np.zeros((nrof_folds, len(thresholds)))
    fprs = np.zeros((nrof_folds, len(thresholds)))
    accuracy = np.zeros(nrof_folds)
    f1scores = np.zeros(nrof_folds)
    best_thresholds = np.zeros(nrof_folds)

    for i, (train, test) in enumerate(splits):
        mean = _fold_mean(embeddings1, embeddings2, train, subtract_mean)
        dist = pair_distances(embeddings1 - mean, embeddings2 - mean, distance_metric)

        # train sweep → best threshold by accuracy
        tp, fp, tn, fn = _confusion_counts(dist[train], issame[train], thresholds)
        acc_train = (tp + tn) / train.size
        best = int(np.argmax(acc_train))
        best_thresholds[i] = thresholds[best]

        # test sweep
        tp, fp, tn, fn = _confusion_counts(dist[test], issame[test], thresholds)
        tprs[i] = _safe_div(tp, tp + fn)
        fprs[i] = _safe_div(fp, fp + tn)
        accuracy[i] = float(tp[best] + tn[best]) / test.size
        precision = _safe_div(tp[best : best + 1], (tp + fp)[best : best + 1])[0]
        recall = tprs[i, best]
        f1scores[i] = (
            0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
        )

    return tprs.mean(0), fprs.mean(0), accuracy, f1scores, best_thresholds


def calculate_val(
    thresholds: np.ndarray,
    embeddings1: np.ndarray,
    embeddings2: np.ndarray,
    actual_issame: np.ndarray,
    far_target: float = 1e-3,
    nrof_folds: int = 10,
    distance_metric: int = SQUARED_EUCLIDEAN,
    subtract_mean: bool = False,
) -> Tuple[float, float, float]:
    """VAL (=TAR) at a target FAR (reference: utility.py:80-119).

    Per fold: sweep FAR over the train split, linearly interpolate the
    threshold achieving ``far_target``, then measure VAL/FAR on the test
    split at that threshold.
    """
    thresholds = np.asarray(thresholds, dtype=np.float64)
    issame = np.asarray(actual_issame, bool)
    n = min(len(issame), embeddings1.shape[0])
    splits = kfold_indices(n, nrof_folds)

    val = np.zeros(nrof_folds)
    far = np.zeros(nrof_folds)

    for i, (train, test) in enumerate(splits):
        mean = _fold_mean(embeddings1, embeddings2, train, subtract_mean)
        dist = pair_distances(embeddings1 - mean, embeddings2 - mean, distance_metric)

        tr_same = issame[train]
        tp, fp, _, _ = _confusion_counts(dist[train], tr_same, thresholds)
        n_diff = max(int((~tr_same).sum()), 1)
        far_train = fp / n_diff

        if far_train.max() >= far_target:
            # far_train is monotone non-decreasing in threshold; piecewise-
            # linear inverse evaluated at far_target (reference uses
            # scipy slinear interp — identical on monotone data).
            threshold = float(np.interp(far_target, far_train, thresholds))
        else:
            threshold = 0.0

        val[i], far[i] = calculate_val_far(threshold, dist[test], issame[test])

    return float(val.mean()), float(val.std()), float(far.mean())


# ---------------------------------------------------------------------------
# top-level report
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VerificationReport:
    tpr: np.ndarray
    fpr: np.ndarray
    accuracy: np.ndarray  # per fold
    f1: np.ndarray  # per fold
    best_thresholds: np.ndarray  # per fold
    val: float  # TAR @ far_target
    val_std: float
    far: float
    auc: float
    eer: float

    @property
    def accuracy_mean(self) -> float:
        return float(self.accuracy.mean())

    @property
    def accuracy_std(self) -> float:
        return float(self.accuracy.std())

    def summary(self) -> str:
        return (
            f"accuracy {self.accuracy_mean:.5f}±{self.accuracy_std:.5f}  "
            f"TAR@FAR {self.val:.5f}±{self.val_std:.5f} (FAR={self.far:.5f})  "
            f"AUC {self.auc:.5f}  EER {self.eer:.5f}"
        )


def _auc_trapezoid(fpr: np.ndarray, tpr: np.ndarray) -> float:
    """Area under the ROC curve (trapezoid rule, matches sklearn.metrics.auc)."""
    order = np.argsort(fpr, kind="stable")
    x, y = fpr[order], tpr[order]
    return float(np.trapezoid(y, x))


def _eer(fpr: np.ndarray, tpr: np.ndarray) -> float:
    """Equal error rate: the x where 1 - x == tpr_interp(x).

    The reference solves this with brentq over an interp1d
    (reference: evaluation/evals.py:71); on a piecewise-linear monotone
    curve the root can be found directly on the crossing segment.
    """
    order = np.argsort(fpr, kind="stable")
    x, y = fpr[order], tpr[order]
    # g(x) = 1 - x - tpr(x); find sign crossing
    g = 1.0 - x - y
    idx = np.nonzero(g <= 0)[0]
    if len(idx) == 0:
        return 1.0
    j = idx[0]
    if j == 0 or g[j] == 0:
        return float(x[j])
    x0, x1, g0, g1 = x[j - 1], x[j], g[j - 1], g[j]
    if g0 == g1:
        return float(x1)
    t = g0 / (g0 - g1)
    return float(x0 + t * (x1 - x0))


def evaluate(
    embeddings: np.ndarray,
    labels: Sequence[bool],
    nrof_folds: int = 10,
    distance_metric: int = SQUARED_EUCLIDEAN,
    subtract_mean: bool = False,
    far_target: float = 1e-3,
    thresholds: Optional[np.ndarray] = None,
    val_thresholds: Optional[np.ndarray] = None,
) -> VerificationReport:
    """Full LFW-protocol eval on interleaved pair embeddings.

    ``embeddings`` is (2N, D) with pair members interleaved
    (reference: utility.py:18-19); ``labels`` is (N,) is-same flags.
    """
    embeddings = np.asarray(embeddings)
    if thresholds is None:
        thresholds = np.arange(0, 4, 0.01)
    if val_thresholds is None:
        val_thresholds = np.arange(0, 4, 0.001)
    e1, e2 = embeddings[0::2], embeddings[1::2]
    tpr, fpr, acc, f1, best_thr = calculate_roc(
        thresholds, e1, e2, np.asarray(labels),
        nrof_folds=nrof_folds, distance_metric=distance_metric,
        subtract_mean=subtract_mean,
    )
    val, val_std, far = calculate_val(
        val_thresholds, e1, e2, np.asarray(labels), far_target,
        nrof_folds=nrof_folds, distance_metric=distance_metric,
        subtract_mean=subtract_mean,
    )
    return VerificationReport(
        tpr=tpr, fpr=fpr, accuracy=acc, f1=f1, best_thresholds=best_thr,
        val=val, val_std=val_std, far=far,
        auc=_auc_trapezoid(fpr, tpr), eer=_eer(fpr, tpr),
    )


def format_confusion_matrix(
    dist: np.ndarray, actual_issame: np.ndarray, threshold: float
) -> str:
    """Human-readable confusion matrix at a threshold
    (reference: utility.py:191-219)."""
    issame = np.asarray(actual_issame, bool)
    tp, fp, tn, fn = (
        int(x[0]) for x in _confusion_counts(dist, issame, np.array([threshold]))
    )
    eps = 1e-3
    recall = tp / (tp + fn + eps)
    precision = tp / (tp + fp + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    acc = (tp + tn) / (tp + tn + fp + fn + eps)
    lines = [
        f"TOTAL TP={tp} TN={tn} FP={fp} FN={fn}",
        "           | same   | different | TRUTH",
        "---------- | ------ | --------- | -----",
        f"      same | {tp:<6} | {fp:<9} |",
        f" different | {fn:<6} | {tn:<9} |",
        f"threshold={threshold:.4f} accuracy={acc * 100:.2f}% "
        f"recall={recall:.4f} precision={precision:.4f} f1={f1:.4f}",
    ]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# labeled-embedding pair construction (shared by the e2e quality script,
# the shipped-weights CI gate, and the embedder training eval — one
# implementation so protocol details like fold-shuffling cannot diverge)
# ---------------------------------------------------------------------------


def verification_pairs(
    labels: Sequence[int],
    rng: np.random.Generator,
    same_per_id: Optional[int] = None,
    impostors_per_id: int = 0,
    impostors_total: int = 0,
    shuffle: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build genuine/impostor verification pairs over identity labels.

    Returns (idx1, idx2, issame) index arrays into the embedding table.
    ``same_per_id=None`` emits EVERY within-identity pair; an integer
    caps each identity at that many (a random subset of its exhaustive
    combinations). Impostors come as ``impostors_per_id`` per identity
    and/or ``impostors_total`` drawn uniformly over identity pairs.
    ``shuffle`` permutes the pair order —
    REQUIRED before :func:`evaluate`'s contiguous k-folds (genuine-then-
    impostor ordering would make entire folds single-class, leaving
    TAR/EER/AUC undefined per fold).
    """
    by_id: dict = {}
    for i, l in enumerate(labels):
        by_id.setdefault(int(l), []).append(i)
    ids = sorted(cid for cid, idxs in by_id.items() if len(idxs) >= 2)
    all_ids = sorted(by_id)
    if (impostors_per_id > 0 or impostors_total > 0) and len(all_ids) < 2:
        raise ValueError(
            f"verification_pairs: impostor pairs need >= 2 identities, "
            f"got {len(all_ids)} (labels may be from a degenerate "
            f"smoke-run split — raise eval_ids or drop impostor counts)"
        )
    e1: list = []
    e2: list = []
    issame: list = []
    for cid in ids:
        idxs = by_id[cid]
        combos = [(a, b) for i_, a in enumerate(idxs) for b in idxs[i_ + 1:]]
        if same_per_id is not None:
            rng.shuffle(combos)
            combos = combos[:same_per_id]
        for a, b in combos:
            e1.append(int(a)); e2.append(int(b)); issame.append(True)
        for _ in range(impostors_per_id):
            other = int(rng.choice([c for c in all_ids if c != cid]))
            e1.append(int(rng.choice(idxs)))
            e2.append(int(rng.choice(by_id[other])))
            issame.append(False)
    for _ in range(impostors_total):
        ca, cb = rng.choice(all_ids, 2, replace=False)
        e1.append(int(rng.choice(by_id[int(ca)])))
        e2.append(int(rng.choice(by_id[int(cb)])))
        issame.append(False)
    e1a, e2a, sa = np.array(e1), np.array(e2), np.array(issame, bool)
    if shuffle:
        perm = rng.permutation(len(e1a))
        e1a, e2a, sa = e1a[perm], e2a[perm], sa[perm]
    return e1a, e2a, sa


def evaluate_pairs(
    embeddings: np.ndarray,
    idx1: np.ndarray,
    idx2: np.ndarray,
    issame: np.ndarray,
    **evaluate_kwargs,
) -> VerificationReport:
    """Interleave ``embeddings[idx1]``/``embeddings[idx2]`` pairwise and
    run :func:`evaluate` (the [0::2]/[1::2] convention of
    reference utility.py:18-19)."""
    embeddings = np.asarray(embeddings)
    interleaved = np.empty((2 * len(idx1), embeddings.shape[1]),
                           embeddings.dtype)
    interleaved[0::2] = embeddings[np.asarray(idx1)]
    interleaved[1::2] = embeddings[np.asarray(idx2)]
    return evaluate(interleaved, np.asarray(issame), **evaluate_kwargs)
