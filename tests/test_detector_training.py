"""Detector training: target assignment semantics + synthetic overfit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_insight_face_tpu.config import DetectorConfig
from deep_insight_face_tpu.detector.loss import build_targets, yolo_loss
from deep_insight_face_tpu.detector.train import (
    create_detector_state,
    make_detector_train_step,
)
from deep_insight_face_tpu.models.yolov3 import TINY_ANCHOR_MASKS, YoloV3Tiny


def _anchors():
    return jnp.asarray(np.array(DetectorConfig().anchors, np.float32))


def test_build_targets_assignment():
    # one 100×100 box centered at (200, 200) in a 416 image → best anchor
    # is (116, 90) (global idx 6) → coarse scale, cell (6, 6) at stride 32
    boxes = jnp.array([[[150.0, 150.0, 250.0, 250.0]]])
    valid = jnp.array([[True]])
    targets = build_targets(
        boxes, valid, _anchors(), TINY_ANCHOR_MASKS, 416, [13, 26]
    )
    t13 = targets[0]
    assert float(t13["obj"].sum()) == 1.0
    assert float(targets[1]["obj"].sum()) == 0.0
    pos = np.argwhere(np.asarray(t13["obj"][0]) > 0.5)
    assert pos.shape == (1, 3)
    row, col, a = pos[0]
    assert (row, col) == (6, 6)
    assert a == 0  # local index of global anchor 6 in mask (6,7,8)
    # in-cell offsets: center 200/32 = 6.25 → offset 0.25
    np.testing.assert_allclose(
        np.asarray(t13["txy"][0, row, col, a]), [0.25, 0.25], atol=1e-5
    )
    # twh = log(100/anchor)
    np.testing.assert_allclose(
        np.asarray(t13["twh"][0, row, col, a]),
        [np.log(100 / 116), np.log(100 / 90)], atol=1e-5,
    )


def test_build_targets_collision_first_wins():
    # two gts whose centers land in the same cell with the same best
    # anchor: the first gt's regression targets must be written intact
    # (not summed with the second's), obj stays exactly 1
    boxes = jnp.array([[[150.0, 150.0, 250.0, 250.0],
                        [148.0, 152.0, 252.0, 248.0]]])
    valid = jnp.array([[True, True]])
    targets = build_targets(
        boxes, valid, _anchors(), TINY_ANCHOR_MASKS, 416, [13, 26]
    )
    t13 = targets[0]
    assert float(t13["obj"].max()) == 1.0
    assert float(t13["obj"].sum()) == 1.0
    np.testing.assert_allclose(
        np.asarray(t13["txy"][0, 6, 6, 0]), [0.25, 0.25], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(t13["twh"][0, 6, 6, 0]),
        [np.log(100 / 116), np.log(100 / 90)], atol=1e-5,
    )


def test_build_targets_invalid_ignored():
    boxes = jnp.array([[[150.0, 150.0, 250.0, 250.0]]])
    valid = jnp.array([[False]])
    targets = build_targets(
        boxes, valid, _anchors(), TINY_ANCHOR_MASKS, 416, [13, 26]
    )
    assert float(sum(t["obj"].sum() for t in targets)) == 0.0


def test_yolo_loss_finite_and_positive(rng):
    heads = [
        jnp.asarray(rng.normal(size=(2, 13, 13, 18)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 26, 26, 18)).astype(np.float32)),
    ]
    boxes = jnp.asarray(
        rng.uniform(50, 350, (2, 4, 4)).astype(np.float32)
    )
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 60.0)
    valid = jnp.ones((2, 4), bool)
    loss, metrics = yolo_loss(
        heads, boxes, valid, _anchors(), TINY_ANCHOR_MASKS, 416
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(metrics["scale0_npos"] + metrics["scale1_npos"]) >= 1


def test_detector_training_overfits_synthetic(rng):
    """Loss decreases training the s2d tiny detector on one fixed scene."""
    cfg = DetectorConfig(variant="tiny_s2d", input_size=128)
    model = YoloV3Tiny(num_classes=1, space_to_depth=True, dtype=jnp.float32)
    state = create_detector_state(model, cfg, jax.random.key(0),
                                  learning_rate=1e-3, input_size=128)
    step = make_detector_train_step(cfg, TINY_ANCHOR_MASKS, input_size=128)

    img = np.zeros((1, 128, 128, 3), np.float32)
    img[0, 40:90, 30:80] = 255.0  # a bright square "face" ([0,255] contract)
    batch = {
        "images": jnp.asarray(img),
        "boxes": jnp.array([[[30.0, 40.0, 80.0, 90.0]]]),
        "valid": jnp.array([[True]]),
    }
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


@pytest.mark.slow
def test_train_detect_ap_loop(tmp_path, rng):
    """Full loop through the REAL data path: save synthetic scenes to
    disk → DetectorSampler batches → train → FaceDetector (serving path)
    → NMS boxes → detection AP improves to a usable level. Exercises the
    train/serve input-scaling contract end-to-end (both normalize /255
    internally from [0,255] inputs)."""
    from PIL import Image

    from deep_insight_face_tpu.detector.data import (
        DetectorSampler, read_box_annotations,
    )
    from deep_insight_face_tpu.detector.runner import FaceDetector
    from deep_insight_face_tpu.detector.utility import evaluate_detections

    scenes = np.zeros((2, 128, 128, 3), np.float32)
    scenes[0, 40:90, 30:80] = 255.0
    scenes[1, 10:60, 60:110] = 204.0
    gts = np.array([[[30.0, 40.0, 80.0, 90.0]], [[60.0, 10.0, 110.0, 60.0]]])
    for i in range(2):
        Image.fromarray(scenes[i].astype(np.uint8)).save(
            tmp_path / f"scene{i}.png"
        )
    (tmp_path / "boxes.csv").write_text(
        "path,x1,y1,x2,y2\n"
        + "\n".join(
            f"scene{i}.png,{gts[i,0,0]},{gts[i,0,1]},{gts[i,0,2]},{gts[i,0,3]}"
            for i in range(2)
        )
    )
    ann = read_box_annotations(str(tmp_path / "boxes.csv"))
    sampler = iter(DetectorSampler(ann, batch_size=2, input_size=128,
                                   max_boxes=1, seed=0))

    cfg = DetectorConfig(variant="tiny_s2d", input_size=128,
                         score_threshold=0.3)
    model = YoloV3Tiny(num_classes=1, space_to_depth=True, dtype=jnp.float32)
    state = create_detector_state(model, cfg, jax.random.key(1),
                                  learning_rate=2e-3, input_size=128)
    step = make_detector_train_step(cfg, TINY_ANCHOR_MASKS, input_size=128)

    for _ in range(120):
        batch = next(sampler)
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()})

    det = FaceDetector(
        {"params": state.params, "batch_stats": state.batch_stats}, cfg, model
    )
    results = det.detect_batch(scenes.astype(np.uint8))
    pred_boxes = [r.boxes[r.valid] for r in results]
    pred_scores = [r.scores[r.valid] for r in results]
    out = evaluate_detections(pred_boxes, pred_scores,
                              [g for g in gts], iou_threshold=0.4)
    assert out["ap"] > 0.4, out


def test_detector_sampler_and_cli(tmp_path, rng):
    from PIL import Image

    from deep_insight_face_tpu.cli import main
    from deep_insight_face_tpu.detector.data import (
        DetectorSampler, read_box_annotations,
    )

    # build a tiny annotated dataset
    for i in range(3):
        img = np.zeros((64, 80, 3), np.uint8)
        img[10:40, 20:60] = 255
        Image.fromarray(img).save(tmp_path / f"img{i}.jpg")
    csv_path = tmp_path / "boxes.csv"
    csv_path.write_text(
        "path,x1,y1,x2,y2\n"
        + "\n".join(f"img{i}.jpg,20,10,60,40" for i in range(3))
    )

    ann = read_box_annotations(str(csv_path))
    assert len(ann) == 3
    s = DetectorSampler(ann, batch_size=2, input_size=32, max_boxes=4, seed=0)
    b = next(iter(s))
    assert b["images"].shape == (2, 32, 32, 3)
    assert b["boxes"].shape == (2, 4, 4)
    assert b["valid"].sum() == 2
    # boxes scaled: x by 32/80, y by 32/64
    np.testing.assert_allclose(b["boxes"][0, 0], [8.0, 5.0, 24.0, 20.0])

    out = tmp_path / "det.npz"
    rc = main([
        "train-detector", "--annotations", str(csv_path),
        "--variant", "tiny_s2d", "--input-size", "64", "--batch-size", "2",
        "--steps", "3", "--output", str(out),
    ])
    assert rc == 0 and out.exists()


@pytest.mark.slow
def test_train_script_kill_resume(tmp_path):
    """SIGKILL the detector training script mid-run (after a snapshot),
    then rerun with --resume: the snapshot must restore cleanly, replay
    the rng past the covered steps, finish, and clean up its .part
    files. Models the round-3 outage where the axon tunnel died at step
    2280/2400 (STATUS.md)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "train_detector_weights.py")
    out = tmp_path / "det.npz"
    args = [
        sys.executable, script,
        "--steps", "96", "--train-n", "8", "--eval-n", "4",
        "--batch", "2", "--input-size", "128", "--max-faces", "2",
        "--snapshot-every", "8", "--seed", "3",
        "--output", str(out),
    ]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    env["JAX_PLATFORM_NAME"] = "cpu"

    part = str(out) + ".part.npz"
    part_meta = str(out) + ".part.json"
    log1 = open(tmp_path / "run1.log", "w")
    proc = subprocess.Popen(args, stdout=log1, stderr=subprocess.STDOUT,
                            env=env)
    try:
        deadline = time.time() + 600
        while time.time() < deadline and proc.poll() is None:
            if os.path.exists(part) and os.path.exists(part_meta):
                break
            time.sleep(0.5)
        assert proc.poll() is None, (
            "script finished before the first snapshot — enlarge --steps: "
            + (tmp_path / "run1.log").read_text()[-2000:]
        )
        proc.send_signal(signal.SIGKILL)  # mid-step, no cleanup
        proc.wait(timeout=60)
    finally:
        log1.close()
        if proc.poll() is None:
            proc.kill()
    assert os.path.exists(part), "snapshot missing after kill"

    r2 = subprocess.run(args + ["--resume"], capture_output=True, text=True,
                        env=env, timeout=1200)
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-2000:]
    assert "resumed from snapshot at step" in r2.stdout
    assert out.exists(), "final weights not written after resume"
    assert not os.path.exists(part), ".part.npz not cleaned up"
    assert not os.path.exists(part_meta), ".part.json not cleaned up"


def test_small_face_assigned_despite_uncovered_anchors():
    """Regression: tiny masks cover anchors 3-8 only; a face whose best
    overall anchor is 0-2 (e.g. 12×14 px — anchor (10,13)) must still be
    assigned to the nearest COVERED anchor instead of being trained as
    background."""
    boxes = jnp.array([[[200.0, 200.0, 212.0, 214.0]]])
    valid = jnp.array([[True]])
    targets = build_targets(
        boxes, valid, _anchors(), TINY_ANCHOR_MASKS, 416, [13, 26]
    )
    total_pos = float(sum(t["obj"].sum() for t in targets))
    assert total_pos == 1.0, (
        f"small face assigned to {total_pos} cells — uncovered-anchor gts "
        "must map into the masked set"
    )
    # it should land on the fine scale (stride 16), whose mask holds the
    # smallest covered anchors (3, 4, 5)
    assert float(targets[1]["obj"].sum()) == 1.0


def test_objectness_ignore_region():
    """Non-positive anchors whose decoded box overlaps a gt above the
    ignore threshold contribute NO noobj loss (standard YOLOv3); a clear
    background cell still does."""
    from deep_insight_face_tpu.detector.loss import yolo_scale_loss, build_targets

    anchors = _anchors()
    boxes = jnp.array([[[150.0, 150.0, 250.0, 250.0]]])
    valid = jnp.array([[True]])
    (t13, _) = build_targets(
        boxes, valid, anchors, TINY_ANCHOR_MASKS, 416, [13, 26]
    )
    a_scale = anchors[jnp.asarray([6, 7, 8])]

    # craft a head whose anchor-1 prediction at the gt cell decodes to
    # (nearly) the gt box: cell (6,6), anchor (156,198): logits so that
    # sigmoid(tx)=0.25, wh = log(100/156), log(100/198); obj logit high
    raw = np.zeros((1, 13, 13, 3, 6), np.float32)
    tx = np.log(0.25 / 0.75)
    raw[0, 6, 6, 1, 0:2] = tx
    raw[0, 6, 6, 1, 2] = np.log(100.0 / 156.0)
    raw[0, 6, 6, 1, 3] = np.log(100.0 / 198.0)
    raw[0, 6, 6, 1, 4] = 6.0  # confident
    head_overlap = jnp.asarray(raw.reshape(1, 13, 13, 18))

    # same confident logit at a far-away background cell instead
    raw2 = np.zeros((1, 13, 13, 3, 6), np.float32)
    raw2[0, 0, 0, 1, 4] = 6.0
    head_bg = jnp.asarray(raw2.reshape(1, 13, 13, 18))

    _, m_overlap = yolo_scale_loss(
        head_overlap, t13, a_scale, 416,
        gt_boxes=boxes, gt_valid=valid,
    )
    _, m_bg = yolo_scale_loss(
        head_bg, t13, a_scale, 416,
        gt_boxes=boxes, gt_valid=valid,
    )
    # the overlapping confident prediction is ignored -> lower obj loss
    # than the same confidence spent on clear background
    assert float(m_overlap["obj"]) < float(m_bg["obj"]) - 0.5, (
        float(m_overlap["obj"]), float(m_bg["obj"]),
    )
