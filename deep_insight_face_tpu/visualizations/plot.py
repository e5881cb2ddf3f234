"""Embedding and training-history visualization.

Working equivalents of the reference's plotting module
(reference: deep_insight_face/visualizations/plot.py:15-238): PCA
before/after scatter, t-SNE scatter with per-class labels, multi-metric
training-history curves, image-grid display — all writing to files
(headless-safe) instead of calling plt.show, plus an embedding
projector export that replaces the broken TF1 TensorBoard exporter
(reference: visualizations/visualize_embeddings.py — SyntaxError at
line 10).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _save(fig, out_path: Optional[str]):
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out_path


def pca_visualization(
    embeddings_before: np.ndarray,
    embeddings_after: np.ndarray,
    labels: Sequence,
    out_path: Optional[str] = None,
):
    """Side-by-side 2-D PCA of embeddings before/after training
    (reference: plot.py:15-50)."""
    from sklearn.decomposition import PCA

    labels = np.asarray(labels)
    fig, axes = plt.subplots(1, 2, figsize=(11, 5))
    for ax, emb, title in [
        (axes[0], embeddings_before, "before training"),
        (axes[1], embeddings_after, "after training"),
    ]:
        p = PCA(n_components=2).fit_transform(np.asarray(emb))
        for cls in np.unique(labels):
            m = labels == cls
            ax.scatter(p[m, 0], p[m, 1], s=8, label=str(cls))
        ax.set_title(title)
    axes[1].legend(fontsize=6, markerscale=0.7, ncol=2)
    return _save(fig, out_path)


def tsne_visualization(
    embeddings: np.ndarray,
    labels: Sequence,
    out_path: Optional[str] = None,
    perplexity: float = 30.0,
):
    """t-SNE scatter with per-class median name labels
    (reference: plot.py:53-91)."""
    from sklearn.manifold import TSNE

    emb = np.asarray(embeddings)
    labels = np.asarray(labels)
    perplexity = min(perplexity, max(2.0, (len(emb) - 1) / 3))
    p = TSNE(n_components=2, perplexity=perplexity, init="pca").fit_transform(emb)
    fig, ax = plt.subplots(figsize=(7, 6))
    classes = np.unique(labels)
    cmap = plt.get_cmap("tab20", len(classes))
    for i, cls in enumerate(classes):
        m = labels == cls
        ax.scatter(p[m, 0], p[m, 1], s=8, color=cmap(i))
        cx, cy = np.median(p[m, 0]), np.median(p[m, 1])
        ax.text(cx, cy, str(cls), fontsize=7, weight="bold")
    ax.set_title("t-SNE of embeddings")
    return _save(fig, out_path)


def hist_plot(
    histories: Sequence[Dict[str, List[float]]] | Dict[str, List[float]],
    metrics: Optional[Sequence[str]] = None,
    out_path: Optional[str] = None,
):
    """Multi-panel metric curves with peak markers and segment boundaries
    when multiple histories are concatenated (reference: plot.py:94-221)."""
    if isinstance(histories, dict):
        histories = [histories]
    merged: Dict[str, List[float]] = {}
    boundaries = [0]
    for h in histories:
        n = max((len(v) for v in h.values()), default=0)
        for k, v in h.items():
            merged.setdefault(k, []).extend(float(x) for x in v)
        boundaries.append(boundaries[-1] + n)
    metrics = list(metrics or merged.keys())
    if not metrics:
        raise ValueError("no metrics to plot")
    fig, axes = plt.subplots(1, len(metrics), figsize=(5 * len(metrics), 4),
                             squeeze=False)
    for ax, key in zip(axes[0], metrics):
        vals = merged.get(key, [])
        ax.plot(vals, label=key)
        if vals:
            best = int(np.argmin(vals)) if "loss" in key else int(np.argmax(vals))
            ax.scatter([best], [vals[best]], color="red", zorder=3)
            ax.annotate(f"{vals[best]:.4f}", (best, vals[best]), fontsize=7)
        for b in boundaries[1:-1]:
            ax.axvline(b, linestyle="--", color="gray", linewidth=0.7)
        ax.set_title(key)
        ax.set_xlabel("epoch")
    return _save(fig, out_path)


def hist_plot_from_jsonl(jsonl_path: str, metrics: Sequence[str],
                         out_path: Optional[str] = None):
    """Plot straight from a MetricsLogger JSONL file."""
    merged: Dict[str, List[float]] = {m: [] for m in metrics}
    with open(jsonl_path) as f:
        for line in f:
            row = json.loads(line)
            for m in metrics:
                if m in row:
                    merged[m].append(row[m])
    return hist_plot(merged, metrics, out_path)


def grid_visualization(
    images: np.ndarray,
    cols: int = 8,
    out_path: Optional[str] = None,
    titles: Optional[Sequence[str]] = None,
):
    """Image grid (reference: plot.py:224-238)."""
    images = np.asarray(images)
    n = len(images)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(1.6 * cols, 1.6 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            img = images[i]
            if img.dtype != np.uint8:
                img = np.clip(img, 0, 255).astype(np.uint8)
            ax.imshow(img)
            if titles is not None and i < len(titles):
                ax.set_title(str(titles[i]), fontsize=6)
    return _save(fig, out_path)


def export_embedding_projector(
    embeddings: np.ndarray,
    labels: Sequence,
    out_dir: str,
) -> str:
    """Write embeddings + metadata TSVs loadable by the TensorBoard /
    projector.tensorflow.org standalone projector — the working
    replacement for the reference's broken TF1 exporter
    (reference: visualizations/visualize_embeddings.py:22-93)."""
    os.makedirs(out_dir, exist_ok=True)
    emb = np.asarray(embeddings)
    np.savetxt(os.path.join(out_dir, "embeddings.tsv"), emb, delimiter="\t")
    with open(os.path.join(out_dir, "metadata.tsv"), "w") as f:
        for label in labels:
            f.write(f"{label}\n")
    config = {
        "embeddings": [
            {
                "tensorName": "face_embeddings",
                "tensorShape": list(emb.shape),
                "tensorPath": "embeddings.tsv",
                "metadataPath": "metadata.tsv",
            }
        ]
    }
    with open(os.path.join(out_dir, "projector_config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return out_dir


def oneshot_sweep_plot(
    sweep: Dict[int, Dict[str, float]], out_path: Optional[str] = None
):
    """Accuracy vs N-way curves for model / pixel-NN / random-guess
    (reference intent: oneshot.py:110-141 ``one_shot_clf`` plot; data
    from :func:`deep_insight_face_tpu.oneshot.oneshot_sweep`)."""
    ways = sorted(sweep)
    fig, ax = plt.subplots(figsize=(6, 4))
    series = [
        ("model", "embedding model", "o-"),
        ("pixel_nn", "pixel nearest-neighbour", "s--"),
        ("random", "random guess", ":"),
    ]
    for key, label, style in series:
        ys = [sweep[n].get(key) for n in ways]
        if any(y is None for y in ys):
            continue
        ax.plot(ways, ys, style, label=label)
    ax.set_xlabel("N (ways)")
    ax.set_ylabel("one-shot accuracy")
    ax.set_ylim(0, 1.05)
    ax.set_xticks(ways)
    ax.grid(True, alpha=0.3)
    ax.legend()
    ax.set_title("N-way one-shot accuracy")
    fig.tight_layout()
    return _save(fig, out_path)
