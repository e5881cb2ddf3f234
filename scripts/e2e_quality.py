"""End-to-end quality report with SHIPPED TRAINED weights: raw frames in,
identity decisions out, nothing short-circuited.

Renders held-out identity scenes (identities disjoint from both the
embedder's train AND eval seed spaces), runs the FULL fused serving
pipeline (detect → Pallas NMS → LandmarkNet 68-pt → similarity align →
embed) with the shipped weights, and reports:

  - detection rate (pipeline `found` over scenes that all contain a face)
  - LFW-protocol verification accuracy / AUC / EER over the pipeline
    embeddings (same/diff pairs across held-out identities)

Writes e2e_quality.json next to the repo STATUS table. Pair with
bench.py's throughput for the complete "fast AND correct" row.

Usage: python scripts/e2e_quality.py [--n-ids 40 --per-id 4]
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

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ids", type=int, default=60)
    ap.add_argument("--per-id", type=int, default=6)
    # ≥1000 impostor pairs resolve FAR=1e-3 (the BASELINE metric of
    # record, reference evaluation/utility.py:26 far_target=1e-3); the
    # r2 eval (160 scenes, 160 impostors) could only report FAR 6e-3
    ap.add_argument("--diff-pairs", type=int, default=3000)
    ap.add_argument("--same-per-id", type=int, default=15)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backbone", default="resnet50v2")
    ap.add_argument("--norm", default="batch", choices=["batch", "group"],
                    help="embedder norm layer — the serving tier's "
                         "shipped MobileNetV2 weights are norm=group")
    ap.add_argument("--detector-input", type=int, default=416)
    ap.add_argument("--detector-variant", default="tiny_mx",
                    help="detector architecture (full|tiny|tiny_s2d|tiny_mx)")
    ap.add_argument("--decision-threshold", type=float, default=None,
                    help="override DetectorConfig.decision_threshold "
                         "(the best-face found gate)")
    ap.add_argument("--hard", action="store_true",
                    help="hard protocol: smaller faces (0.15-0.35 of "
                         "frame), ±0.5 rad in-plane pose, 50%% facial "
                         "occlusion — the standard protocol saturated "
                         "at 1.0 (STATUS round 4); writes "
                         "e2e_quality_hard.json unless --output given")
    ap.add_argument("--embedder-weights", default=None,
                    help="npz path to evaluate INSTEAD of the shipped "
                         "embedder (candidate-weight validation before "
                         "promotion; recorded in the output JSON)")
    ap.add_argument("--detector-weights", default=None,
                    help="npz path to evaluate INSTEAD of the shipped "
                         "detector (candidate validation — e.g. a "
                         "hard-scene retrain — before promotion)")
    ap.add_argument("--landmark-weights", default=None,
                    help="npz path to evaluate INSTEAD of the shipped "
                         "LandmarkNet (candidate validation — e.g. an "
                         "occlusion-hardened retrain — before promotion)")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    if args.output is None:
        args.output = os.path.join(
            os.path.dirname(__file__), "..",
            "e2e_quality_hard.json" if args.hard else "e2e_quality.json")

    import jax

    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.data.synthetic import identity_scenes

    import dataclasses

    cfg = default_config()
    det_kw = dict(variant=args.detector_variant,
                  input_size=args.detector_input)
    if args.decision_threshold is not None:
        det_kw["decision_threshold"] = args.decision_threshold
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, backbone=args.backbone,
                                  norm=args.norm),
        detector=dataclasses.replace(cfg.detector, **det_kw),
    )

    embed_variables = None
    if args.embedder_weights:
        from deep_insight_face_tpu.utils.weights import load_npz

        embed_variables = load_npz(args.embedder_weights)
        print(f"candidate embedder: {args.embedder_weights}", flush=True)
        # honour the JSON sidecar the trainers write: a candidate trained
        # under a different ModelConfig (e.g. other image_size on a
        # fully-conv backbone) would otherwise load and evaluate silently
        # wrong, mis-scoring promotion (ADVICE r4)
        sidecar = args.embedder_weights.replace(".npz", ".json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                side_model = json.load(f).get("model", {})
            mine = dataclasses.asdict(cfg.model)
            bad = {k: (v, mine[k]) for k, v in side_model.items()
                   if k in mine and mine[k] != v}
            if bad:
                print(f"ERROR: candidate sidecar ModelConfig disagrees "
                      f"with the eval config: {bad} — pass matching "
                      f"--backbone/--norm (sidecar: {sidecar})",
                      file=sys.stderr, flush=True)
                return 2
    detector_variables = None
    if args.detector_weights:
        from deep_insight_face_tpu.utils.weights import load_npz

        detector_variables = load_npz(args.detector_weights)
        print(f"candidate detector: {args.detector_weights}", flush=True)
    landmark_variables = None
    if args.landmark_weights:
        from deep_insight_face_tpu.utils.weights import load_npz

        landmark_variables = load_npz(args.landmark_weights)
        print(f"candidate landmarks: {args.landmark_weights}", flush=True)
    fr = FaceRecognition(cfg, embed_variables=embed_variables,
                         detector_variables=detector_variables,
                         landmark_variables=landmark_variables)
    from deep_insight_face_tpu.utils import pretrained

    weights = {
        "detector": (
            pretrained.weights_path(
                f"detector_{cfg.detector.variant}_{cfg.detector.input_size}.npz")
            or pretrained.weights_path(f"detector_{cfg.detector.variant}.npz")
        ) is not None,
        "landmark": pretrained.weights_path("landmark_68.npz") is not None,
        "embedder": (embed_variables is not None
                     or pretrained.load_matching_embedder(cfg.model)
                     is not None),
    }
    print(f"shipped weights present: {weights}", flush=True)
    if not all(weights.values()):
        print("WARNING: missing shipped weights above run RANDOM-INIT — "
              "the report would be meaningless; check --backbone/--norm/"
              "--detector-variant", file=sys.stderr, flush=True)

    t0 = time.time()
    print(f"rendering {args.n_ids}×{args.per_id} held-out identity scenes "
          f"@{args.size}…", flush=True)
    # id_offset=20M: disjoint from embedder train (0..) AND eval (10M..)
    hard_kw = (dict(min_face=0.15, max_face=0.35, rotation_range=0.5,
                    occlude=0.5) if args.hard else {})
    imgs, labels = identity_scenes(
        args.n_ids, args.per_id, size=args.size, seed=args.seed,
        id_offset=20_000_000, **hard_kw,
    )
    print(f"  done in {time.time()-t0:.0f}s", flush=True)

    from deep_insight_face_tpu.evaluation.verification import (
        evaluate_pairs, verification_pairs,
    )
    from deep_insight_face_tpu.utils.batching import batched_apply

    embs, _, found = batched_apply(fr.face_encodings_batch, imgs, args.batch)
    det_rate = float(found.mean())
    print(f"detection rate: {det_rate:.3f}", flush=True)

    # LFW-protocol pairs over pipeline embeddings: every same pair (up to
    # --same-per-id each) + --diff-pairs sampled impostors, shuffled so
    # the contiguous k-folds stay two-class (see verification_pairs)
    e1, e2, issame = verification_pairs(
        labels, np.random.default_rng(7), same_per_id=args.same_per_id,
        impostors_total=args.diff_pairs,
    )
    n_same = int(issame.sum())
    print(f"pairs: {n_same} genuine + {args.diff_pairs} impostor", flush=True)

    def run_eval(mask):
        return evaluate_pairs(
            embs, e1[mask], e2[mask], issame[mask],
            nrof_folds=10, distance_metric=0, subtract_mean=True,
            far_target=1e-3,
        )

    # metric of record: every pair counts, a detection miss is an error
    report = run_eval(np.ones(len(e1), bool))
    print(report.summary(), flush=True)
    # conditioned on detection: the embedder's own quality through the
    # pipeline (misses fall back to the central crop; see
    # pipeline._select_best_box)
    both_found = found[e1] & found[e2]
    report_det = run_eval(both_found)
    print(f"detected-only pairs ({int(both_found.sum())}): "
          f"accuracy {float(np.mean(report_det.accuracy)):.4f} "
          f"auc {float(report_det.auc):.4f}", flush=True)

    out = {
        "protocol": "hard" if args.hard else "standard",
        "weights_present": weights,
        "embedder_weights": args.embedder_weights or "shipped",
        "detector_weights": args.detector_weights or "shipped",
        "landmark_weights": args.landmark_weights or "shipped",
        "n_identities": args.n_ids,
        "scenes": int(len(imgs)),
        "detection_rate": det_rate,
        "pairs": {"genuine": n_same, "impostor": args.diff_pairs},
        "verification": {
            "accuracy": float(np.mean(report.accuracy)),
            "accuracy_std": float(np.std(report.accuracy)),
            "auc": float(report.auc),
            "eer": float(report.eer),
            "far_target": 1e-3,
            "tar_at_far_1e3": float(report.val),
            "far_achieved": float(report.far),
        },
        "verification_detected_only": {
            "pairs": int(both_found.sum()),
            "accuracy": float(np.mean(report_det.accuracy)),
            "auc": float(report_det.auc),
            "eer": float(report_det.eer),
            "tar_at_far_1e3": float(report_det.val),
        },
        "pipeline": "detect->nms->landmark68->similarity_align->embed "
                    f"({cfg.detector.variant} + LandmarkNet + "
                    f"{cfg.model.backbone})",
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out), flush=True)
    with open(os.path.abspath(args.output), "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
