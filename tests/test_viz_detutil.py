"""Visualization + detector-utility tests (headless matplotlib)."""

import json
import os

import numpy as np
import pytest

from deep_insight_face_tpu.detector import utility as DU
from deep_insight_face_tpu.visualizations import plot as V


def test_bbox_iou_numpy():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = DU.bbox_iou_numpy(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-9)


def test_compute_ap_perfect_and_zero():
    assert DU.compute_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    assert DU.compute_ap(np.array([0.0]), np.array([0.0])) == pytest.approx(0.0)


def test_evaluate_detections_perfect():
    gt = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]])]
    preds = [gt[0].astype(float)]
    scores = [np.array([0.9, 0.8])]
    out = DU.evaluate_detections(preds, scores, gt)
    assert out["ap"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)


def test_evaluate_detections_with_false_positive():
    gt = [np.array([[0, 0, 10, 10]])]
    preds = [np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)]
    scores = [np.array([0.9, 0.95])]  # FP scored higher
    out = DU.evaluate_detections(preds, scores, gt)
    assert out["ap"] < 1.0
    assert out["num_gt"] == 1 and out["num_pred"] == 2


def test_draw_boxes():
    img = np.zeros((40, 40, 3), np.uint8)
    out = DU.draw_boxes(img, np.array([[5, 5, 20, 20]]), scores=np.array([0.7]),
                        labels=["face"])
    assert out.shape == img.shape
    assert out[5, 10].tolist() == [0, 220, 60]  # top edge drawn
    assert img.sum() == 0  # original untouched


def test_pca_tsne_hist_grid(tmp_path, rng):
    emb0 = rng.normal(size=(40, 16))
    labels = np.repeat(np.arange(4), 10)
    emb1 = emb0 + labels[:, None] * 2.0
    p1 = V.pca_visualization(emb0, emb1, labels, str(tmp_path / "pca.png"))
    assert os.path.exists(p1)
    p2 = V.tsne_visualization(emb1, labels, str(tmp_path / "tsne.png"),
                              perplexity=5)
    assert os.path.exists(p2)
    p3 = V.hist_plot(
        [{"loss": [3, 2, 1], "accuracy": [0.1, 0.5, 0.8]},
         {"loss": [1, 0.5], "accuracy": [0.8, 0.9]}],
        out_path=str(tmp_path / "hist.png"),
    )
    assert os.path.exists(p3)
    imgs = rng.integers(0, 255, (5, 8, 8, 3), dtype=np.uint8)
    p4 = V.grid_visualization(imgs, cols=3, out_path=str(tmp_path / "grid.png"),
                              titles=["a", "b", "c", "d", "e"])
    assert os.path.exists(p4)


def test_hist_plot_from_jsonl(tmp_path):
    rows = [{"step": i, "loss": 3.0 - i * 0.1} for i in range(10)]
    path = tmp_path / "train.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows))
    out = V.hist_plot_from_jsonl(str(path), ["loss"], str(tmp_path / "h.png"))
    assert os.path.exists(out)


def test_export_embedding_projector(tmp_path, rng):
    emb = rng.normal(size=(10, 8))
    out = V.export_embedding_projector(emb, [f"id{i}" for i in range(10)],
                                       str(tmp_path / "proj"))
    assert os.path.exists(os.path.join(out, "embeddings.tsv"))
    assert os.path.exists(os.path.join(out, "metadata.tsv"))
    cfg = json.load(open(os.path.join(out, "projector_config.json")))
    assert cfg["embeddings"][0]["tensorShape"] == [10, 8]
    loaded = np.loadtxt(os.path.join(out, "embeddings.tsv"), delimiter="\t")
    np.testing.assert_allclose(loaded, emb, atol=1e-6)


def test_metrics_logger(tmp_path):
    from deep_insight_face_tpu.utils.metrics import MetricsLogger, timed

    logger = MetricsLogger(str(tmp_path), name="t")
    logger.log(1, {"loss": 2.5, "skipme": object()})
    logger.log(2, {"loss": 2.0})
    assert logger.scalars("loss") == [2.5, 2.0]
    logger.close()
    lines = open(os.path.join(tmp_path, "t.jsonl")).read().strip().splitlines()
    assert len(lines) == 2 and json.loads(lines[0])["loss"] == 2.5

    sink = {}
    with timed("op", sink):
        pass
    assert "op" in sink and sink["op"] >= 0
