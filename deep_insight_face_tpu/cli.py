"""Typed CLI: train / evaluate / generate-pairs / pack-bin /
convert-weights / demo / enroll / identify / bench.

One argparse tree replacing the reference's four console scripts
(reference: scripts/insight_face.py click group + generate_pairs.py +
raw_img_tf.py + yolo_convert_tf.py argparse; setup.py:10-17), with no
import-time model building and no side effects.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional


def _add_common_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--backbone", default="resnet50v2",
                   choices=["resnet50v2", "mobilenetv2", "vgg16", "inception_nn4"])
    p.add_argument("--head", default="gdc", choices=["v1", "dense", "gdc", "none"])
    p.add_argument("--embedding-size", type=int, default=128)
    p.add_argument("--image-size", type=int, default=112)


def cmd_train(args: argparse.Namespace) -> int:
    from deep_insight_face_tpu.config import config_from_overrides
    from deep_insight_face_tpu.training.trainer import Trainer

    cfg = config_from_overrides(
        {
            "model": {
                "backbone": args.backbone,
                "head": args.head,
                "embedding_size": args.embedding_size,
                "image_size": args.image_size,
            },
            "data": {
                "batch_size": args.batch_size,
                "augmentation": args.augmentation,
            },
            "train": {
                "mode": args.mode,
                "epochs": args.epochs,
                "steps_per_epoch": args.steps_per_epoch,
                "learning_rate": args.lr,
                "num_classes": args.num_classes,
                "checkpoint_dir": args.checkpoint_dir,
            },
            "mesh": {"model_parallel": args.model_parallel},
        }
    )
    trainer = Trainer(cfg, log_dir=args.log_dir)
    result = trainer.fit_directory(args.data_dir)
    print(
        f"trained {result.steps} steps in {result.wall_time_s:.1f}s "
        f"(early stop: {result.stopped_early}); "
        f"checkpoints in {cfg.train.checkpoint_dir}"
    )
    return 0


def cmd_evaluate(args: argparse.Namespace) -> int:
    import jax
    import numpy as np

    from deep_insight_face_tpu.config import EvalConfig, ModelConfig
    from deep_insight_face_tpu.evaluation.evals import evaluate_lfw, report_to_csv
    from deep_insight_face_tpu.models import build_embedding_model
    from deep_insight_face_tpu.ops.image import preprocess
    from deep_insight_face_tpu.parallel.train_step import create_train_state
    from deep_insight_face_tpu.config import Config, TrainConfig
    from deep_insight_face_tpu.utils.checkpoint import CheckpointManager

    mcfg = ModelConfig(
        backbone=args.backbone, head=args.head,
        embedding_size=args.embedding_size, image_size=args.image_size,
    )
    cfg = Config(model=mcfg, train=TrainConfig(checkpoint_dir=args.checkpoint_dir))
    if args.checkpoint_dir and os.path.isdir(args.checkpoint_dir):
        # The restore template must match the TRAINING config (mode decides
        # whether a classifier/alpha exists; num_classes decides its shape).
        # Trainer persists config.json next to the checkpoints — prefer it
        # over CLI args, which only describe the model.
        mgr = CheckpointManager(args.checkpoint_dir)
        saved = mgr.load_config()
        if saved is not None:
            if saved.model != mcfg:
                print(f"note: using model config saved with the checkpoint "
                      f"({saved.model.backbone}/{saved.model.head}, "
                      f"{saved.model.embedding_size}-D) over CLI args")
            cfg = saved
        model = build_embedding_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        if mgr.latest_step() is not None:
            # partial restore: eval needs no classifier/opt state, so even
            # config-less checkpoints with unknown num_classes/mode load
            state = mgr.restore_for_eval(state)
            print(f"restored checkpoint step {int(state.step)}")
    else:
        model = build_embedding_model(mcfg)
        state = create_train_state(model, cfg, jax.random.key(0))

    jit_embed = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )
    variables = {"params": {k: v for k, v in state.params.items() if k != "classifier"},
                 "batch_stats": state.batch_stats}

    def embed_fn(imgs):
        return np.asarray(
            jit_embed(variables, preprocess(imgs, cfg.data.preprocess_mode))
        )

    ecfg = EvalConfig(
        n_folds=args.folds, distance_metric=args.distance_metric,
        subtract_mean=args.subtract_mean, use_flipped_images=args.flip,
        batch_size=args.batch_size,
    )
    report = evaluate_lfw(
        embed_fn, args.data_dir, args.pairs, ecfg,
        image_size=cfg.model.image_size,
    )
    print(report.summary())
    if args.csv:
        report_to_csv(report, args.csv)
        print(f"wrote {args.csv}")
    return 0


def cmd_generate_pairs(args: argparse.Namespace) -> int:
    from deep_insight_face_tpu.data.pairs import generate_pairs

    generate_pairs(
        args.image_dir, args.num_folds, args.num_matches_mismatches,
        write_to_file=True, pairs_file_name=args.pairs_file_name,
        seed=args.seed,
    )
    print(f"wrote {os.path.join(args.image_dir, args.pairs_file_name)}")
    return 0


def cmd_pack_bin(args: argparse.Namespace) -> int:
    from deep_insight_face_tpu.data.packer import pack_pairs_bin

    n, skipped = pack_pairs_bin(
        args.image_dir, args.pairs, args.output, image_size=args.image_size
    )
    print(f"packed {n} pairs ({skipped} skipped) → {args.output}")
    return 0


def cmd_convert_weights(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.models.yolov3 import YoloV3
    from deep_insight_face_tpu.utils.weights import load_darknet_weights, save_npz

    model = YoloV3(num_classes=args.num_classes)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, args.input_size, args.input_size, 3))
    )
    loaded = load_darknet_weights(args.weights, variables)
    save_npz(args.output, loaded)
    print(f"converted {args.weights} → {args.output}")
    return 0


def cmd_train_detector(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.config import DetectorConfig
    from deep_insight_face_tpu.detector.data import (
        DetectorSampler,
        read_box_annotations,
    )
    from deep_insight_face_tpu.detector.train import (
        create_detector_state,
        make_detector_train_step,
    )
    from deep_insight_face_tpu.pipeline import make_detector_model
    from deep_insight_face_tpu.utils.weights import save_npz

    cfg = DetectorConfig(variant=args.variant, input_size=args.input_size)
    model, masks = make_detector_model(cfg)
    state = create_detector_state(model, cfg, jax.random.key(args.seed),
                                  learning_rate=args.lr)
    step = make_detector_train_step(cfg, masks)

    ann = read_box_annotations(args.annotations)
    sampler = iter(DetectorSampler(ann, args.batch_size, cfg.input_size,
                                   cfg.max_boxes, seed=args.seed))
    for i in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(sampler).items()}
        state, metrics = step(state, batch)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            print(f"step {i + 1}/{args.steps} loss {float(metrics['loss']):.4f}")
    save_npz(args.output, {"params": state.params,
                           "batch_stats": state.batch_stats})
    print(f"saved detector weights → {args.output}")
    return 0


def cmd_train_landmarks(args: argparse.Namespace) -> int:
    import jax.numpy as jnp

    from deep_insight_face_tpu.models.landmark import LandmarkNet
    from deep_insight_face_tpu.training.landmark import (
        load_landmark_npz,
        train_landmarks,
    )
    from deep_insight_face_tpu.utils.weights import save_npz

    data = load_landmark_npz(args.data)
    imgs = data["images"].astype("float32")
    lms = data["landmarks"]
    n = len(imgs)

    def batches():
        import numpy as _np

        r = _np.random.default_rng(args.seed)
        while True:
            idx = r.integers(0, n, args.batch_size)
            yield {"images": jnp.asarray(imgs[idx]),
                   "landmarks": jnp.asarray(lms[idx])}

    model = LandmarkNet()
    state, history = train_landmarks(
        batches(), steps=args.steps, model=model,
        image_size=imgs.shape[1], learning_rate=args.lr, seed=args.seed,
    )
    print(f"final loss {history[-1]['loss']:.4f} nme {history[-1]['nme']:.4f}")
    save_npz(args.output, {"params": state.params,
                           "batch_stats": state.batch_stats})
    print(f"saved landmark weights → {args.output}")
    return 0


def cmd_demo(args: argparse.Namespace) -> int:
    import numpy as np

    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.data.dataset import load_image

    fr = FaceRecognition()
    img = load_image(args.image)
    t0 = time.perf_counter()
    # one detector pass; landmarks/crops/encodings all derive from it
    _, boxes = fr.detect_bbox(img)
    landmarks = [fr.raw_landmarks(img, np.asarray(b)) for b in boxes]
    crops = [fr.align_face(img, lm) for lm in landmarks]
    encodings = list(fr.encode_crops(np.stack(crops))) if crops else []
    dt = time.perf_counter() - t0
    print(f"found {len(encodings)} face(s) in {dt * 1000:.1f} ms")
    labels = None
    if args.gallery and encodings:
        from deep_insight_face_tpu.gallery import FaceGallery

        g = FaceGallery.load(args.gallery)
        if len(g) == 0:
            print("gallery is empty — skipping identification",
                  file=sys.stderr)
        else:
            names, scores = g.identify_topk(np.stack(encodings), k=1)
            labels = [f"{n[0]} {float(s[0]):.2f}"
                      for n, s in zip(names, scores)]
    for i, e in enumerate(encodings):
        who = f" — {labels[i]}" if labels else ""
        print(f"  face {i}: 128-D embedding, "
              f"norm {np.linalg.norm(e):.3f}{who}")
    if args.output:
        from PIL import Image

        from deep_insight_face_tpu.detector.utility import draw_boxes

        if boxes:
            out = draw_boxes(
                img, np.stack([np.asarray(b)[:4] for b in boxes]),
                labels=labels,
            )
        else:
            out = np.array(img, copy=True)
        h, w = out.shape[:2]
        for pts in landmarks:
            for x, y in pts.astype(int):
                out[max(y - 1, 0) : min(y + 2, h),
                    max(x - 1, 0) : min(x + 2, w)] = (255, 80, 40)
        Image.fromarray(out).save(args.output)
        print(f"annotated image → {args.output}")
    return 0


def _encode_paths(fr, paths: List[str], native_resolution: bool = False):
    """Decode ``paths`` and run the fused batch pipeline over them.

    By default every frame is host-letterboxed to ONE canonical square
    (the detector's input size — where the pipeline would resample it
    anyway), so the whole tree costs a single compile. With
    ``native_resolution`` frames keep their decoded sizes and are grouped
    by (H, W) — each distinct shape compiles its own program (5-60 s per
    shape on the TPU toolchain), worth it only when faces are small
    relative to high-resolution frames and crop detail matters.

    Each group streams through `utils.batching.batched_apply` in
    fixed-size device batches (tail padded), so arbitrarily large trees
    cost ONE compile per shape and bounded device memory.

    Returns (embeddings (N, D) float32, found (N,) bool) aligned with
    ``paths``."""
    import numpy as np

    from deep_insight_face_tpu.data.dataset import letterbox_image, load_image
    from deep_insight_face_tpu.utils.batching import batched_apply

    frames = [load_image(p) for p in paths]
    if not native_resolution:
        size = fr.cfg.detector.input_size
        frames = [letterbox_image(f, size) for f in frames]
    groups: dict = {}
    for i, f in enumerate(frames):
        groups.setdefault(f.shape[:2], []).append(i)
    emb = None
    found = np.zeros(len(paths), bool)
    for idx in groups.values():
        e, _, fnd = batched_apply(
            fr.face_encodings_batch,
            np.stack([frames[i] for i in idx]),
            min(len(idx), 32),
        )
        if emb is None:
            emb = np.zeros((len(paths), e.shape[1]), np.float32)
        emb[np.asarray(idx)] = np.asarray(e, np.float32)
        found[np.asarray(idx)] = np.asarray(fnd, bool)
    return emb, found


def cmd_enroll(args: argparse.Namespace) -> int:
    """Build a FaceGallery from a folder-per-identity tree: detect, align
    and embed every image through the fused pipeline, enroll one mean
    (re-normalized) embedding per identity (working equivalent of the
    reference's hand-maintained 'database' dict, predictions.py:47-135)."""
    import numpy as np

    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.data.dataset import get_dataset
    from deep_insight_face_tpu.gallery import FaceGallery

    classes = get_dataset(args.image_dir, min_images=args.min_images)
    if not classes:
        print(f"no identities found under {args.image_dir}", file=sys.stderr)
        return 1
    fr = FaceRecognition()
    paths: List[str] = []
    owner: List[str] = []
    for c in classes:
        paths.extend(c.image_paths)
        owner.extend([c.name] * len(c.image_paths))
    emb, found = _encode_paths(fr, paths, args.native_resolution)
    owner_arr = np.array(owner)
    names: List[str] = []
    vecs: List[np.ndarray] = []
    for c in classes:
        mask = owner_arr == c.name
        if not args.keep_undetected:
            mask &= found
        if not mask.any():
            print(f"  {c.name}: no face detected in any image — skipped",
                  file=sys.stderr)
            continue
        m = emb[mask].mean(axis=0)
        m /= max(float(np.linalg.norm(m)), 1e-12)
        names.append(c.name)
        vecs.append(m)
    if not names:
        print("no identities enrolled", file=sys.stderr)
        return 1
    gallery = FaceGallery(embedding_size=emb.shape[1])
    gallery.add_batch(names, np.stack(vecs))
    gallery.save(args.output)
    print(
        f"enrolled {len(names)}/{len(classes)} identities "
        f"({len(paths)} images, {int(found.sum())} with a detected face) "
        f"→ {args.output}"
    )
    return 0


def cmd_identify(args: argparse.Namespace) -> int:
    """Identify faces in each image against a saved gallery (top-k names
    + cosine scores; 'unknown' below --min-score). Default: the best face
    per image; --all-faces runs the fused multiface pipeline and reports
    every detection above the enumeration threshold."""
    import numpy as np

    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.data.dataset import letterbox_image, load_image
    from deep_insight_face_tpu.gallery import FaceGallery

    gallery = FaceGallery.load(args.gallery)
    if len(gallery) == 0:
        print("gallery is empty", file=sys.stderr)
        return 1
    fr = FaceRecognition()
    k = max(1, min(args.top_k, len(gallery)))

    def topline(row_names, row_scores):
        best = (row_names[0] if float(row_scores[0]) >= args.min_score
                else "unknown")
        detail = ", ".join(
            f"{n}={float(s):.3f}" for n, s in zip(row_names, row_scores)
        )
        return f"{best} ({detail})"

    if args.all_faces:
        frames = [load_image(p) for p in args.images]
        if not args.native_resolution:
            size = fr.cfg.detector.input_size
            frames = [letterbox_image(f, size) for f in frames]
        groups: dict = {}
        for i, f in enumerate(frames):
            groups.setdefault(f.shape[:2], []).append(i)
        misses: List[int] = []
        from deep_insight_face_tpu.utils.batching import batched_apply

        for idx in groups.values():
            emb, boxes, _, valid = batched_apply(
                fr.face_encodings_batch_multi,
                np.stack([frames[i] for i in idx]),
                min(len(idx), 16),
            )
            for row, i in enumerate(idx):
                path = args.images[i]
                slots = np.flatnonzero(valid[row])
                if slots.size == 0:
                    # enumeration found nothing at the multiface
                    # threshold — fall back to the decision-gated
                    # single-best-face path (same semantics as
                    # FaceDetector.__call__), so --all-faces is never
                    # worse than the default mode
                    misses.append(i)
                    continue
                names, scores = gallery.identify_topk(emb[row, slots], k=k)
                for j, s in enumerate(slots):
                    b = boxes[row, s].astype(int)
                    print(f"{path}: face {j} @[{b[0]},{b[1]},{b[2]},{b[3]}]"
                          f": {topline(names[j], scores[j])}")
        if misses:
            miss_paths = [args.images[i] for i in misses]
            emb, found = _encode_paths(fr, miss_paths,
                                       args.native_resolution)
            names, scores = gallery.identify_topk(emb, k=k)
            for path, fnd, rn, rs in zip(miss_paths, found, names, scores):
                if not fnd:
                    print(f"{path}: no face detected")
                else:
                    print(f"{path}: {topline(rn, rs)}")
        return 0

    emb, found = _encode_paths(fr, args.images,
                                args.native_resolution)
    names, scores = gallery.identify_topk(emb, k=k)
    for path, fnd, row_names, row_scores in zip(
        args.images, found, names, scores
    ):
        if not fnd:
            print(f"{path}: no face detected")
            continue
        print(f"{path}: {topline(row_names, row_scores)}")
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import subprocess

    return subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py"),
         str(args.batch)]
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="deep-insight-face-tpu",
        description="TPU-native face recognition framework",
    )
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train an embedding model")
    _add_common_model_args(t)
    t.add_argument("--data-dir", required=True)
    t.add_argument("--mode", default="arcface",
                   choices=["siamese", "triplet", "batch_hard",
                            "batch_hard_euclidean", "batch_hard_auto",
                            "batch_all", "semi_hard", "arcface", "cosface"])
    t.add_argument("--epochs", type=int, default=20)
    t.add_argument("--steps-per-epoch", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=128)
    # keep in sync with ops.image.AUGMENTATION_OPTIONS (not imported here:
    # parser construction stays jax-free; tests/test_cli.py pins the sync)
    t.add_argument("--augmentation", default="non_geometric",
                   choices=["default", "geometric", "non_geometric", "both",
                            "all", "occlusion", "none"])
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--num-classes", type=int, default=1000)
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--log-dir", default="logs")
    t.add_argument("--model-parallel", type=int, default=1)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate", help="LFW-protocol verification eval")
    _add_common_model_args(e)
    e.add_argument("--data-dir", required=True)
    e.add_argument("--pairs", required=True)
    e.add_argument("--checkpoint-dir", default="")
    e.add_argument("--folds", type=int, default=10)
    e.add_argument("--distance-metric", type=int, default=0, choices=[0, 1])
    e.add_argument("--subtract-mean", action="store_true")
    e.add_argument("--flip", action="store_true")
    e.add_argument("--batch-size", type=int, default=128)
    e.add_argument("--csv", default="")
    e.set_defaults(fn=cmd_evaluate)

    g = sub.add_parser("generate-pairs", help="write an LFW-style pairs.txt")
    g.add_argument("--image-dir", required=True)
    g.add_argument("--pairs-file-name", default="pairs.txt")
    g.add_argument("--num-folds", type=int, required=True)
    g.add_argument("--num-matches-mismatches", type=int, required=True)
    g.add_argument("--seed", type=int, default=0)
    g.set_defaults(fn=cmd_generate_pairs)

    b = sub.add_parser("pack-bin", help="pack pair images into one binary")
    b.add_argument("--image-dir", required=True)
    b.add_argument("--pairs", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--image-size", type=int, default=112)
    b.set_defaults(fn=cmd_pack_bin)

    c = sub.add_parser("convert-weights", help="Darknet .weights → npz")
    c.add_argument("--weights", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--num-classes", type=int, default=1)
    c.add_argument("--input-size", type=int, default=416)
    c.set_defaults(fn=cmd_convert_weights)

    td = sub.add_parser("train-detector", help="train a YOLO face detector")
    td.add_argument("--annotations", required=True,
                    help="CSV: path,x1,y1,x2,y2 (one row per box)")
    td.add_argument("--variant", default="tiny_mx",
                    choices=["full", "tiny", "tiny_s2d", "tiny_mx"])
    td.add_argument("--input-size", type=int, default=416)
    td.add_argument("--batch-size", type=int, default=16)
    td.add_argument("--steps", type=int, default=1000)
    td.add_argument("--lr", type=float, default=1e-3)
    td.add_argument("--seed", type=int, default=0)
    td.add_argument("--output", default="detector_weights.npz")
    td.set_defaults(fn=cmd_train_detector)

    tl = sub.add_parser("train-landmarks", help="train the 68-pt landmark net")
    tl.add_argument("--data", required=True,
                    help="npz with images (N,S,S,3) uint8 + landmarks (N,68,2)")
    tl.add_argument("--steps", type=int, default=1000)
    tl.add_argument("--batch-size", type=int, default=64)
    tl.add_argument("--lr", type=float, default=1e-4)
    tl.add_argument("--seed", type=int, default=0)
    tl.add_argument("--output", default="landmark_weights.npz")
    tl.set_defaults(fn=cmd_train_landmarks)

    d = sub.add_parser("demo", help="detect+embed faces in one image")
    d.add_argument("image")
    d.add_argument("--output", default="",
                   help="write an annotated copy (boxes + 68-pt landmarks)")
    d.add_argument("--gallery", default="",
                   help="optional gallery .npz — captions boxes with the "
                        "best-match identity")
    d.set_defaults(fn=cmd_demo)

    en = sub.add_parser(
        "enroll", help="build a gallery from a folder-per-identity tree"
    )
    en.add_argument("--image-dir", required=True)
    en.add_argument("--output", required=True, help="gallery .npz path")
    en.add_argument("--min-images", type=int, default=1)
    en.add_argument("--keep-undetected", action="store_true",
                    help="enroll best-effort crops even when no face "
                         "passed the decision gate")
    en.add_argument("--native-resolution", action="store_true",
                    help="keep decoded frame sizes (one compile per "
                         "distinct shape) instead of letterboxing to "
                         "the detector input size")
    en.set_defaults(fn=cmd_enroll)

    idf = sub.add_parser(
        "identify", help="match faces against a saved gallery"
    )
    idf.add_argument("--gallery", required=True)
    idf.add_argument("images", nargs="+")
    idf.add_argument("--top-k", type=int, default=3)
    idf.add_argument("--min-score", type=float, default=0.0,
                     help="cosine score below which the best match "
                          "prints as 'unknown'")
    idf.add_argument("--native-resolution", action="store_true",
                     help="keep decoded frame sizes (one compile per "
                          "distinct shape) instead of letterboxing to "
                          "the detector input size")
    idf.add_argument("--all-faces", action="store_true",
                     help="identify every detected face per image "
                          "(fused multiface pipeline) instead of the "
                          "single best face")
    idf.set_defaults(fn=cmd_identify)

    bn = sub.add_parser("bench", help="run the throughput benchmark")
    bn.add_argument("--batch", type=int, default=32)
    bn.set_defaults(fn=cmd_bench)

    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
