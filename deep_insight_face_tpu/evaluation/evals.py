"""End-to-end verification evaluation: pairs.txt → embeddings → k-fold
ROC / TAR@FAR / AUC / EER report + CSV export.

Working equivalent of the reference's evaluate entry point
(reference: deep_insight_face/evaluation/evals.py:19-125 — whose batch
loop iterates ``next(generator)`` incorrectly and references undefined
names; SURVEY §2 #14). Embedding extraction is batched + jitted, with
optional horizontal-flip augmentation fusion (average of emb(x) and
emb(flip(x)) — the eval CLI's flip flag).
"""

from __future__ import annotations

import csv
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from deep_insight_face_tpu.config import EvalConfig
from deep_insight_face_tpu.data.dataset import ImageLoader
from deep_insight_face_tpu.data.pairs import read_pairs, resolve_pair_paths
from deep_insight_face_tpu.evaluation.verification import (
    VerificationReport,
    evaluate,
)


def embed_paths(
    embed_fn: Callable[[np.ndarray], np.ndarray],
    paths: Sequence[str],
    image_size: int,
    batch_size: int = 128,
    use_flipped: bool = False,
    loader: Optional[ImageLoader] = None,
    preprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> np.ndarray:
    """Decode + embed a path list in fixed-size batches (padding the tail
    so the jitted embed_fn sees one geometry)."""
    loader = loader or ImageLoader(image_size=image_size)
    out: List[np.ndarray] = []
    n = len(paths)
    for start in range(0, n, batch_size):
        chunk = list(paths[start : start + batch_size])
        pad = batch_size - len(chunk)
        imgs = loader.load_batch(chunk).astype(np.float32)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        if preprocess is not None:
            imgs = preprocess(imgs)
        emb = np.asarray(embed_fn(imgs))
        if use_flipped:
            emb_f = np.asarray(embed_fn(imgs[:, :, ::-1, :]))
            emb = (emb + emb_f) / 2.0
        out.append(emb[: batch_size - pad])
    return np.concatenate(out)


def evaluate_lfw(
    embed_fn: Callable[[np.ndarray], np.ndarray],
    lfw_dir: str,
    pairs_path: str,
    cfg: Optional[EvalConfig] = None,
    preprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    image_size: int = 112,
) -> VerificationReport:
    """Full protocol (reference: evals.py:28-79): parse pairs, resolve
    paths, embed both members of every pair, run the k-fold report."""
    cfg = cfg or EvalConfig()
    pairs = read_pairs(pairs_path)
    paths, issame, skipped = resolve_pair_paths(lfw_dir, pairs)
    if skipped:
        print(f"skipped {skipped} pairs with missing files")
    if not issame:
        raise ValueError("no resolvable pairs")
    embeddings = embed_paths(
        embed_fn, paths, image_size, cfg.batch_size,
        use_flipped=cfg.use_flipped_images, preprocess=preprocess,
    )
    thresholds = np.arange(0, cfg.threshold_max, cfg.roc_threshold_step)
    val_thresholds = np.arange(0, cfg.threshold_max, cfg.val_threshold_step)
    return evaluate(
        embeddings, issame,
        nrof_folds=cfg.n_folds,
        distance_metric=cfg.distance_metric,
        subtract_mean=cfg.subtract_mean,
        far_target=cfg.far_target,
        thresholds=thresholds,
        val_thresholds=val_thresholds,
    )


def evaluate_bin(
    embed_fn: Callable[[np.ndarray], np.ndarray],
    bin_path: str,
    cfg: Optional[EvalConfig] = None,
    preprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> VerificationReport:
    """Eval from a packed pairs bin (data/packer.py), the fast-IO path the
    reference reads via its pickle .bin (reference: training/triplet.py:84-90
    val-data .bin branch, scripts/raw_img_tf.py)."""
    from deep_insight_face_tpu.data.packer import load_pairs_bin

    cfg = cfg or EvalConfig()
    images, issame = load_pairs_bin(bin_path)
    embs = []
    n = len(images)
    bs = cfg.batch_size
    for start in range(0, n, bs):
        chunk = images[start : start + bs].astype(np.float32)
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        if preprocess is not None:
            chunk = preprocess(chunk)
        e = np.asarray(embed_fn(chunk))
        if cfg.use_flipped_images:
            e = (e + np.asarray(embed_fn(chunk[:, :, ::-1, :]))) / 2.0
        embs.append(e[: bs - pad])
    embeddings = np.concatenate(embs)
    return evaluate(
        embeddings, list(issame),
        nrof_folds=cfg.n_folds, distance_metric=cfg.distance_metric,
        subtract_mean=cfg.subtract_mean, far_target=cfg.far_target,
        thresholds=np.arange(0, cfg.threshold_max, cfg.roc_threshold_step),
        val_thresholds=np.arange(0, cfg.threshold_max, cfg.val_threshold_step),
    )


def pair_details_to_csv(
    path: str,
    pair_paths: Sequence[str],
    embeddings: np.ndarray,
    issame: Sequence[bool],
    threshold: float,
    distance_metric: int = 0,
) -> int:
    """Per-pair prediction detail export: both file paths, distance,
    ground truth, prediction, and TP/FP/TN/FN tag — the intent of the
    reference's result_to_csv (reference: evaluation/evals.py:91-125,
    whose writer loop references undefined names). Returns row count."""
    from deep_insight_face_tpu.evaluation.verification import pair_distances

    e1, e2 = embeddings[0::2], embeddings[1::2]
    dist = pair_distances(e1, e2, distance_metric)
    pred = dist < threshold
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path_a", "path_b", "distance", "is_same", "predicted_same",
                    "outcome"])
        for i, same in enumerate(issame):
            outcome = (
                "TP" if (pred[i] and same) else
                "FP" if pred[i] else
                "FN" if same else "TN"
            )
            w.writerow([
                pair_paths[2 * i], pair_paths[2 * i + 1],
                float(dist[i]), bool(same), bool(pred[i]), outcome,
            ])
    return len(issame)


def report_to_csv(report: VerificationReport, path: str) -> None:
    """Detailed CSV export (reference: evals.py:91-125 result_to_csv)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "value"])
        w.writerow(["accuracy_mean", report.accuracy_mean])
        w.writerow(["accuracy_std", report.accuracy_std])
        w.writerow(["tar_at_far", report.val])
        w.writerow(["tar_at_far_std", report.val_std])
        w.writerow(["far", report.far])
        w.writerow(["auc", report.auc])
        w.writerow(["eer", report.eer])
        w.writerow([])
        w.writerow(["fold", "accuracy", "f1", "best_threshold"])
        for i, (a, f1, t) in enumerate(
            zip(report.accuracy, report.f1, report.best_thresholds)
        ):
            w.writerow([i, a, f1, t])
        w.writerow([])
        w.writerow(["threshold_index", "tpr", "fpr"])
        for i, (tp, fp) in enumerate(zip(report.tpr, report.fpr)):
            w.writerow([i, tp, fp])
