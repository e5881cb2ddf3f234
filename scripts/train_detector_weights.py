"""Train the shipped tiny_s2d face-detector weights on procedural scenes.

Produces deep_insight_face_tpu/weights/detector_tiny_s2d.npz — the
default detector api.FaceRecognition loads — plus a JSON sidecar with
held-out detection AP. (The reference never trains its detector; it can
only convert pre-trained Darknet blobs, scripts/yolo_convert_tf.py.)

Usage: python scripts/train_detector_weights.py [--steps 2400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2400)
    ap.add_argument("--train-n", type=int, default=1000)
    ap.add_argument("--eval-n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--max-faces", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variant", default="tiny_s2d")
    ap.add_argument("--snapshot-every", type=int, default=400,
                    help="write <output>.part.npz every N steps so a "
                         "wedged TPU tunnel mid-run (CLAUDE.md) costs "
                         "at most N steps, not the whole run; 0 disables")
    ap.add_argument("--resume", action="store_true",
                    help="continue from <output>.part.npz if present "
                         "(params/batch_stats restored; Adam moments "
                         "restart — a few hundred steps of warmup, not "
                         "a quality cliff)")
    ap.add_argument("--workers", type=int, default=0,
                    help="parallel scene-render processes (0 = the "
                         "legacy sequential stream; see "
                         "data/synthetic.detection_scenes)")
    ap.add_argument("--faceless-frac", type=float, default=0.0,
                    help="fraction of scenes rendered with ZERO faces "
                         "(pure clutter) — hard negatives that teach "
                         "the objectness head that distractor shapes "
                         "alone are background (the tiny_mx variant "
                         "trained without them fired a 0.84-confidence "
                         "box on 1/192 faceless frames)")
    ap.add_argument("--rotation-range", type=float, default=0.25,
                    help="in-plane pose range (radians) for rendered "
                         "faces — the hard e2e protocol uses 0.5 "
                         "(scripts/e2e_quality.py --hard)")
    ap.add_argument("--occlude", type=float, default=0.0,
                    help="per-face probability of an opaque rectangle "
                         "occluder painted over the composited face "
                         "(box label stays the full face extent — "
                         "amodal supervision); hard protocol uses 0.5")
    ap.add_argument("--scene-cache", default=None,
                    help="npz path: load rendered scenes from it if "
                         "present, else render then save — lets two "
                         "variant runs (e.g. tiny_mx + full) share one "
                         "scene render (the single-core wall-clock "
                         "bottleneck)")
    ap.add_argument(
        "--output",
        default=os.path.join(
            os.path.dirname(__file__), "..", "deep_insight_face_tpu",
            "weights", "detector_tiny_s2d.npz",
        ),
    )
    args = ap.parse_args()

    from deep_insight_face_tpu.config import DetectorConfig
    from deep_insight_face_tpu.data.synthetic import detection_scenes
    from deep_insight_face_tpu.detector.runner import FaceDetector
    from deep_insight_face_tpu.detector.train import (
        create_detector_state,
        make_detector_train_step,
    )
    from deep_insight_face_tpu.detector.utility import evaluate_detections
    from deep_insight_face_tpu.pipeline import make_detector_model
    from deep_insight_face_tpu.utils.weights import save_npz

    t0 = time.time()
    if args.scene_cache and os.path.exists(args.scene_cache):
        z = np.load(args.scene_cache)
        imgs, boxes, valid = z["imgs"], z["boxes"], z["valid"]
        if len(imgs) != args.train_n + args.eval_n or (
                imgs.shape[1] != args.input_size):
            print(f"ERROR: scene cache {args.scene_cache} holds "
                  f"{len(imgs)} scenes @{imgs.shape[1]} — wants "
                  f"{args.train_n + args.eval_n} @{args.input_size}",
                  file=sys.stderr, flush=True)
            return 2
        print(f"loaded scene cache {args.scene_cache} ({len(imgs)} scenes)",
              flush=True)
    else:
        print(f"rendering {args.train_n}+{args.eval_n} scenes "
              f"@{args.input_size}…", flush=True)
        imgs, boxes, valid = detection_scenes(
            args.train_n + args.eval_n, size=args.input_size,
            max_faces=args.max_faces, seed=args.seed, workers=args.workers,
            faceless_frac=args.faceless_frac,
            rotation_range=args.rotation_range, occlude=args.occlude,
        )
        if args.scene_cache:
            os.makedirs(os.path.dirname(os.path.abspath(args.scene_cache)),
                        exist_ok=True)
            np.savez_compressed(args.scene_cache, imgs=imgs, boxes=boxes,
                                valid=valid)
            print(f"saved scene cache {args.scene_cache}", flush=True)
    tr = slice(0, args.train_n)
    ev = slice(args.train_n, None)
    print(f"  done in {time.time() - t0:.0f}s "
          f"({valid.sum()} faces total)", flush=True)

    cfg = DetectorConfig(variant=args.variant, input_size=args.input_size,
                         max_boxes=args.max_faces, score_threshold=0.3)
    model, masks = make_detector_model(cfg)
    state = create_detector_state(model, cfg, jax.random.key(args.seed),
                                  learning_rate=args.lr)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"{args.variant}: {n_params/1e6:.2f}M params", flush=True)
    step = make_detector_train_step(cfg, masks)

    chunk = min(8, args.steps)

    part_path = os.path.abspath(args.output) + ".part.npz"
    part_meta = part_path[: -len(".npz")] + ".json"
    start_step = 0
    if args.resume and os.path.exists(part_path):
        from deep_insight_face_tpu.utils.weights import load_npz

        try:
            snap = load_npz(part_path)
            with open(part_meta) as f:
                start_step = json.load(f)["step"]
        except Exception as e:  # truncated/corrupt snapshot: start over
            print(f"snapshot unusable ({e!r}) — training from scratch",
                  flush=True)
            start_step = 0
        else:
            start_step -= start_step % chunk
            state = state.replace(
                params=snap["params"], batch_stats=snap["batch_stats"]
            )
            print(f"resumed from snapshot at step {start_step}", flush=True)

    @jax.jit
    def multi_step(state, batches):
        metrics = None
        for j in range(chunk):
            state, metrics = step(
                state, jax.tree.map(lambda x: x[j], batches)
            )
        return state, metrics

    r = np.random.default_rng(args.seed)
    t0 = time.time()
    n_chunks = args.steps // chunk
    for i in range(n_chunks):
        idx = r.integers(0, args.train_n, (chunk, args.batch))
        done = (i + 1) * chunk
        if done <= start_step:  # resume: replay the rng, skip the work
            continue
        batches = {
            "images": jnp.asarray(imgs[tr][idx]).astype(jnp.float32),
            "boxes": jnp.asarray(boxes[tr][idx]),
            "valid": jnp.asarray(valid[tr][idx]),
        }
        state, metrics = multi_step(state, batches)
        if (i + 1) % max(n_chunks // 20, 1) == 0:
            print(
                f"step {done}/{args.steps} loss {float(metrics['loss']):.3f} "
                f"({(time.time()-t0)/max(done - start_step, 1)*1000:.0f} "
                f"ms/step)", flush=True,
            )
        if args.snapshot_every and done % args.snapshot_every == 0:
            # atomic: a kill mid-write must not leave a truncated npz
            # that poisons the next --resume
            # tmp name keeps the .npz suffix (np.savez appends it otherwise)
            save_npz(part_path + ".tmp.npz", {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            })
            os.replace(part_path + ".tmp.npz", part_path)
            with open(part_meta + ".tmp", "w") as f:
                json.dump({"step": done}, f)
            os.replace(part_meta + ".tmp", part_meta)

    # held-out AP through the REAL serving path (FaceDetector: letterbox,
    # /255, decode, Pallas NMS)
    det = FaceDetector(
        {"params": state.params, "batch_stats": state.batch_stats}, cfg, model
    )
    pred_boxes, pred_scores, gt_list = [], [], []
    faceless_total = faceless_fp = 0
    ev_imgs, ev_boxes, ev_valid = imgs[ev], boxes[ev], valid[ev]
    for s in range(0, len(ev_imgs), 16):
        for rres, gb, gv in zip(
            det.detect_batch(ev_imgs[s : s + 16]),
            ev_boxes[s : s + 16], ev_valid[s : s + 16],
        ):
            pred_boxes.append(rres.boxes[rres.valid])
            pred_scores.append(rres.scores[rres.valid])
            gt_list.append(gb[gv])
            if not gv.any():  # faceless hard negative: count FPs at the
                # serving decision gate (DetectorConfig.decision_threshold)
                faceless_total += 1
                top = float(rres.scores[rres.valid].max()) if (
                    rres.valid.any()) else 0.0
                faceless_fp += top > cfg.decision_threshold
    out = evaluate_detections(pred_boxes, pred_scores, gt_list,
                              iou_threshold=0.5)
    print(f"held-out AP@0.5 = {out['ap']:.3f} "
          f"(precision {out.get('precision', float('nan')):.3f} "
          f"recall {out.get('recall', float('nan')):.3f})", flush=True)
    if faceless_total:
        print(f"faceless eval frames: {faceless_fp}/{faceless_total} fire "
              f"above the {cfg.decision_threshold} decision gate",
              flush=True)

    path = os.path.abspath(args.output)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_npz(path, {"params": state.params, "batch_stats": state.batch_stats},
             dtype="float16")
    meta = {
        "variant": args.variant,
        "input_size": args.input_size,
        "steps": args.steps,
        "train_scenes": args.train_n,
        "eval_scenes": args.eval_n,
        "heldout_ap50": out["ap"],
        "params_m": n_params / 1e6,
        "platform": jax.devices()[0].platform,
    }
    if args.faceless_frac:
        meta["faceless_frac"] = args.faceless_frac
        meta["faceless_fp_at_gate"] = [faceless_fp, faceless_total]
    if args.rotation_range != 0.25:
        meta["rotation_range"] = args.rotation_range
    if args.occlude:
        meta["occlude"] = args.occlude
    with open(path.replace(".npz", ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    for p in (part_path, part_meta):  # final save supersedes snapshots
        if os.path.exists(p):
            os.remove(p)
    print(f"saved {path} ({os.path.getsize(path)/1e6:.1f} MB)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
