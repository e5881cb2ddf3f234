"""Train the shipped face-embedding weights on the procedural identity
world, and report held-out verification quality.

Produces deep_insight_face_tpu/weights/embedder_synth.npz (+ JSON
sidecar with the exact ModelConfig and the held-out LFW-protocol
verification metrics). Held-out identities share nothing with training
identities (disjoint FaceParams seeds), so the reported accuracy is a
real generalization number on the synthetic manifold.

Usage: python scripts/train_embedder_weights.py [--steps 3000]
       [--backbone mobilenetv2 --width 0.5]    # shipped default
       [--backbone resnet50v2 --width 1.0 --no-save]  # full-fat run
"""

from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n-ids", type=int, default=300)
    ap.add_argument("--per-id", type=int, default=20)
    ap.add_argument("--eval-ids", type=int, default=50)
    ap.add_argument("--eval-per-id", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="cosine: warmup then cosine decay over --steps "
                         "to 1%% of --lr — the standard ArcFace "
                         "end-of-run margin-tightening decay")
    ap.add_argument("--backbone", default="mobilenetv2")
    ap.add_argument("--width", type=float, default=0.5)
    ap.add_argument("--embedding-size", type=int, default=128)
    # NOTE: default none — on the small procedural world ANY appearance
    # augmentation makes BatchNorm batch-relative features pay off more
    # than absolute ones; ArcFace then converges onto a batch-stat
    # shortcut (train-acc 1.0) whose clean-input embeddings collapse to
    # one direction (held-out AUC exactly 0.5). Verified by controlled
    # A/B on chip: aug→cos-gap 2e-6, none→0.75. Use augmentation freely
    # on real datasets where batch-relative shortcuts don't pay.
    ap.add_argument("--augmentation", default="none")
    # aligned: render in serving geometry (ArcFace-template-aligned
    # crops, data/synthetic.aligned_identity_dataset) so the embedder
    # sees exactly what the fused pipeline's landmark-align stage emits.
    # pipeline: crops harvested through the REAL serving pipeline
    # (shipped detector + LandmarkNet + align over rendered scenes,
    # data/synthetic.pipeline_emitted_dataset) — detector box jitter
    # included, the last distribution shift closed.
    # mixed: pipeline crops + aligned renders concatenated (same label
    # space; doubles data and covers both distributions).
    ap.add_argument("--world", default="aligned",
                    choices=["aligned", "plain", "pipeline", "mixed"])
    # pipeline/mixed-world harvest geometry: match the DEPLOYMENT the
    # embedder will serve (e.g. --scene-size 320 --detector-input 320
    # for the natively-320 serving tier — STATUS r4: the tier embedder
    # trained on aligned renders scored e2e TAR@1e-3 0.32 vs the 320
    # path's 0.999 with a pipeline-trained embedder)
    ap.add_argument("--scene-size", type=int, default=416)
    ap.add_argument("--detector-input", type=int, default=None)
    # hard-protocol stress axes for the pipeline-world harvest: crops
    # from small/rotated/occluded faces carry the REAL hard-distribution
    # jitter through detect→landmark→align (scripts/e2e_quality.py
    # --hard uses min_face 0.15-0.35, rotation 0.5, occlude 0.5)
    ap.add_argument("--scene-min-face", type=float, default=0.25)
    ap.add_argument("--scene-max-face", type=float, default=0.45)
    ap.add_argument("--scene-rotation", type=float, default=0.25)
    ap.add_argument("--scene-occlude", type=float, default=0.0)
    ap.add_argument("--render-workers", type=int, default=0,
                    help="scene-render process pool for pipeline-world "
                         "harvest (0 = in-process)")
    ap.add_argument("--harvest-cache", default=None,
                    help="npz path: load the rendered/harvested train+eval "
                         "crops from it if present, else harvest then save "
                         "— a pipeline-world harvest costs ~40 min on one "
                         "CPU, a recipe retry shouldn't pay it twice")
    # BN-denial phase start (see TrainConfig.bn_freeze_step). MobileNetV2
    # needs it on this world; ResNetV2 trains clean without it.
    ap.add_argument("--bn-freeze-step", type=int, default=0)
    # "group": batch-independent normalization (mobilenetv2+gdc) — the
    # architectural fix for the BN shortcut; weights are NOT Keras-port
    # compatible (different norm layers), so it is a separate config.
    ap.add_argument("--norm", default="batch", choices=["batch", "group"])
    # Teacher-embedding distillation: cosine-pull the student toward a
    # stronger shipped embedder's geometry on the SAME crops (e.g. the
    # flagship ResNet50V2 teaching the serving-tier MobileNetV2-GN).
    # The teacher npz needs its JSON sidecar (exact ModelConfig) beside
    # it; teacher and student must share image size + embedding dim.
    ap.add_argument("--distill-from", default=None,
                    help="npz path of a teacher embedder (sidecar "
                         "required); adds distill_weight*(1-cos) to the "
                         "ArcFace loss")
    ap.add_argument("--distill-weight", type=float, default=4.0)
    # Warm start: load backbone+head params (and batch_stats) from a
    # shipped embedder npz (sidecar-validated same ModelConfig); the
    # ArcFace classifier stays freshly initialized. Fine-tuning the
    # flagship onto a harder crop distribution preserves the standard-
    # protocol tail geometry that cold starts have to re-earn.
    ap.add_argument("--init-from", default=None,
                    help="npz of a same-config embedder to warm-start "
                         "backbone+head from (classifier re-initialized)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-save", action="store_true")
    ap.add_argument("--output", default=None,
                    help="default: weights/embedder_synth_<backbone>.npz")
    args = ap.parse_args()
    if args.output is None:
        args.output = os.path.join(
            os.path.dirname(__file__), "..", "deep_insight_face_tpu",
            "weights",
            f"embedder_synth_{args.backbone}"
            + ("_gn" if args.norm == "group" else "") + ".npz",
        )

    from deep_insight_face_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from deep_insight_face_tpu.data.synthetic import (
        aligned_identity_dataset, identity_dataset,
    )
    from deep_insight_face_tpu.evaluation.verification import evaluate
    from deep_insight_face_tpu.models import build_embedding_model
    from deep_insight_face_tpu.ops.image import augment_batch, preprocess
    from deep_insight_face_tpu.parallel.train_step import (
        create_train_state, make_train_step,
    )
    from deep_insight_face_tpu.utils.weights import save_npz

    t0 = time.time()
    if args.harvest_cache and os.path.exists(args.harvest_cache):
        z = np.load(args.harvest_cache)
        tr_imgs, tr_labels = z["tr_imgs"], z["tr_labels"]
        ev_imgs, ev_labels = z["ev_imgs"], z["ev_labels"]
        print(f"loaded harvest cache {args.harvest_cache}: "
              f"{len(tr_imgs)} train + {len(ev_imgs)} eval crops", flush=True)
    elif args.world in ("pipeline", "mixed"):
        print(f"rendering {args.n_ids}×{args.per_id} train + "
              f"{args.eval_ids}×{args.eval_per_id} held-out identities…",
              flush=True)
        from deep_insight_face_tpu.data.synthetic import (
            pipeline_emitted_dataset,
        )

        harvest_kw = dict(scene_size=args.scene_size,
                          detector_input=args.detector_input,
                          workers=args.render_workers,
                          min_face=args.scene_min_face,
                          max_face=args.scene_max_face,
                          rotation_range=args.scene_rotation,
                          occlude=args.scene_occlude)
        tr_imgs, tr_labels, det_rate = pipeline_emitted_dataset(
            args.n_ids, args.per_id, size=args.size, seed=args.seed,
            **harvest_kw,
        )
        print(f"  pipeline-emitted train crops: {len(tr_imgs)} "
              f"(detection rate {det_rate:.3f})", flush=True)
        if args.world == "mixed":
            al_imgs, al_labels = aligned_identity_dataset(
                args.n_ids, args.per_id, size=args.size, seed=args.seed + 5
            )
            tr_imgs = np.concatenate([tr_imgs, al_imgs])
            tr_labels = np.concatenate([tr_labels, al_labels])
        # held-out eval crops come through the pipeline too (disjoint
        # ids), so the reported metrics predict e2e serving quality
        ev_imgs, ev_labels, ev_rate = pipeline_emitted_dataset(
            args.eval_ids, args.eval_per_id, size=args.size,
            seed=args.seed + 1, id_offset=10_000_000, **harvest_kw,
        )
        print(f"  pipeline-emitted eval crops: {len(ev_imgs)} "
              f"(detection rate {ev_rate:.3f})", flush=True)
    else:
        print(f"rendering {args.n_ids}×{args.per_id} train + "
              f"{args.eval_ids}×{args.eval_per_id} held-out identities…",
              flush=True)
        make = (aligned_identity_dataset if args.world == "aligned"
                else identity_dataset)
        tr_imgs, tr_labels = make(
            args.n_ids, args.per_id, size=args.size, seed=args.seed
        )
        # held-out identities: disjoint FaceParams seed space
        ev_imgs, ev_labels = make(
            args.eval_ids, args.eval_per_id, size=args.size,
            seed=args.seed + 1, id_offset=10_000_000,
        )
    print(f"  done in {time.time() - t0:.0f}s", flush=True)
    if args.harvest_cache and not os.path.exists(args.harvest_cache):
        os.makedirs(os.path.dirname(os.path.abspath(args.harvest_cache)),
                    exist_ok=True)
        np.savez_compressed(
            args.harvest_cache, tr_imgs=tr_imgs, tr_labels=tr_labels,
            ev_imgs=ev_imgs, ev_labels=ev_labels,
        )
        print(f"saved harvest cache {args.harvest_cache}", flush=True)

    cfg = Config(
        model=ModelConfig(
            backbone=args.backbone, head="gdc",
            embedding_size=args.embedding_size, image_size=args.size,
            width_multiplier=args.width, norm=args.norm,
        ),
        data=DataConfig(batch_size=args.batch,
                        augmentation=args.augmentation),
        train=TrainConfig(
            mode="arcface", num_classes=args.n_ids,
            learning_rate=args.lr, warmup_steps=min(200, args.steps // 5),
            lr_schedule=args.lr_schedule, decay_steps=args.steps,
            distill_weight=(args.distill_weight if args.distill_from
                            else 0.0),
        ),
    )
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(cfg.train.seed))
    if args.init_from:
        from deep_insight_face_tpu.utils.weights import load_npz

        iside = args.init_from.replace(".npz", ".json")
        if os.path.exists(iside):
            with open(iside) as f:
                imeta = json.load(f)["model"]
            ifields = {f.name for f in dataclasses.fields(ModelConfig)}
            icfg = ModelConfig(**{k: v for k, v in imeta.items()
                                  if k in ifields})
            if icfg != cfg.model:
                print(f"ERROR: --init-from config {icfg} != student "
                      f"{cfg.model}", file=sys.stderr)
                return 2
        ivars = load_npz(args.init_from)
        params = dict(state.params)
        for k, v in ivars["params"].items():
            if k != "classifier":
                params[k] = v
        state = state.replace(
            params=params,
            batch_stats=ivars.get("batch_stats", state.batch_stats),
        )
        print(f"warm start from {os.path.basename(args.init_from)} "
              f"(classifier fresh)", flush=True)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"{args.backbone} w={args.width}: {n_params/1e6:.2f}M params",
          flush=True)
    step = make_train_step(cfg)
    step_frozen = (make_train_step(cfg, bn_frozen=True)
                   if args.bn_freeze_step > 0 else None)

    # ---- teacher targets for distillation (one batched pass) ----
    distill_targets = None
    if args.distill_from:
        from deep_insight_face_tpu.utils.batching import batched_apply
        from deep_insight_face_tpu.utils.weights import load_npz

        side = args.distill_from.replace(".npz", ".json")
        with open(side) as f:
            tmeta = json.load(f)["model"]
        tfields = {f.name for f in dataclasses.fields(ModelConfig)}
        tcfg = ModelConfig(**{k: v for k, v in tmeta.items()
                              if k in tfields})
        if tcfg.image_size != args.size:
            print(f"ERROR: teacher image_size {tcfg.image_size} != "
                  f"student --size {args.size}", file=sys.stderr)
            return 2
        if tcfg.embedding_size != args.embedding_size:
            print(f"ERROR: teacher embedding_size {tcfg.embedding_size} "
                  f"!= student {args.embedding_size}", file=sys.stderr)
            return 2
        teacher = build_embedding_model(tcfg)
        tvars = load_npz(args.distill_from)

        @jax.jit
        def tembed(x):
            return teacher.apply(tvars, preprocess(
                x.astype(jnp.float32), "tf"), train=False)

        tg = batched_apply(lambda x: tembed(jnp.asarray(x)),
                           np.asarray(tr_imgs), 128)
        tg = np.asarray(tg, np.float32)
        tg /= np.maximum(np.linalg.norm(tg, axis=1, keepdims=True), 1e-12)
        distill_targets = tg
        print(f"distill targets: {len(tg)} teacher embeddings from "
              f"{os.path.basename(args.distill_from)} "
              f"(weight {args.distill_weight})", flush=True)

    chunk = min(8, args.steps)
    aug_opt = cfg.data.augmentation

    def make_multi(step_fn):
        @jax.jit
        def multi_step(state, images_u8, labels, key, targets):
            metrics = None
            for j in range(chunk):
                x = images_u8[j].astype(jnp.float32)
                if aug_opt != "none":
                    key, sub = jax.random.split(key)
                    x = augment_batch(sub, x, aug_opt)
                batch = {
                    "images": preprocess(x, cfg.data.preprocess_mode),
                    "labels": labels[j],
                }
                if distill_targets is not None:
                    batch["distill_targets"] = targets[j]
                state, metrics = step_fn(state, batch)
            return state, metrics
        return multi_step

    multi_warm = make_multi(step)
    multi_frozen = make_multi(step_frozen) if step_frozen else None

    r = np.random.default_rng(args.seed)
    n_train = len(tr_imgs)
    t0 = time.time()
    n_chunks = args.steps // chunk
    for i in range(n_chunks):
        idx = r.integers(0, n_train, (chunk, args.batch))
        multi_step = (
            multi_frozen
            if multi_frozen is not None and i * chunk >= args.bn_freeze_step
            else multi_warm
        )
        state, metrics = multi_step(
            state,
            jnp.asarray(tr_imgs[idx]),
            jnp.asarray(tr_labels[idx].astype(np.int32)),
            jax.random.key(i),
            jnp.asarray(distill_targets[idx])
            if distill_targets is not None
            else jnp.zeros((chunk, 1), jnp.float32),
        )
        done = (i + 1) * chunk
        if (i + 1) % max(n_chunks // 20, 1) == 0:
            acc = float(metrics.get("accuracy", np.nan))
            print(
                f"step {done}/{args.steps} loss {float(metrics['loss']):.3f} "
                f"train-acc {acc:.3f} "
                f"({(time.time()-t0)/done*1000:.0f} ms/step)", flush=True,
            )

    # ---- held-out verification (LFW protocol on unseen identities) ----
    variables = {
        "params": {k: v for k, v in state.params.items() if k != "classifier"},
        "batch_stats": state.batch_stats,
    }

    @jax.jit
    def embed(v, x):
        return model.apply(v, preprocess(x.astype(jnp.float32), "tf"),
                           train=False)

    from deep_insight_face_tpu.utils.batching import batched_apply

    # pad-to-batch so the ragged tail doesn't force a second jit compile
    embs = batched_apply(lambda x: embed(variables, jnp.asarray(x)),
                         np.asarray(ev_imgs), 128)

    # balanced same/diff pairs over held-out ids (shared builder — caps
    # genuine pairs per id, shuffles for two-class k-folds)
    from deep_insight_face_tpu.evaluation.verification import (
        evaluate_pairs, verification_pairs,
    )

    e1, e2, issame = verification_pairs(
        ev_labels, np.random.default_rng(7), same_per_id=6,
        impostors_per_id=6,
    )
    report = evaluate_pairs(
        embs, e1, e2, issame,
        nrof_folds=10, distance_metric=0, subtract_mean=True,
    )
    print(report.summary(), flush=True)

    # collapse guard: all-pairs cos gap must be non-degenerate, else the
    # run hit the BatchNorm batch-stat shortcut (see --augmentation note)
    en = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
    cos = en @ en.T
    same_m = ev_labels[:, None] == ev_labels[None, :]
    np.fill_diagonal(same_m, False)
    gap = float(cos[same_m].mean() - cos[~same_m & ~np.eye(len(en), dtype=bool)].mean())
    print(f"held-out cos gap (same-diff): {gap:.5f}", flush=True)
    if gap < 0.005 or float(report.auc) < 0.7:
        print("ERROR: embedding geometry degenerate — refusing to ship "
              "these weights (historic causes: margin-softmax antipodal "
              "minimum — fixed, ops/losses.py — and BN batch-stat "
              "shortcuts)", flush=True)
        return 1

    meta = {
        "model": dataclasses.asdict(cfg.model),
        "train": {"mode": "arcface", "num_classes": args.n_ids,
                  "steps": args.steps, "lr": args.lr,
                  "lr_schedule": args.lr_schedule,
                  "init_from": (os.path.basename(args.init_from)
                                if args.init_from else None)},
        "heldout": {
            "n_identities": args.eval_ids,
            "accuracy": float(np.mean(report.accuracy)),
            "accuracy_std": float(np.std(report.accuracy)),
            "auc": float(report.auc),
            "eer": float(report.eer),
            "tar": float(report.val),
            "far": float(report.far),
        },
        "params_m": n_params / 1e6,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(meta["heldout"]), flush=True)
    if not args.no_save:
        path = os.path.abspath(args.output)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        save_npz(path, variables, dtype="float16")
        with open(path.replace(".npz", ".json"), "w") as f:
            json.dump(meta, f, indent=2)
        print(f"saved {path} ({os.path.getsize(path)/1e6:.1f} MB)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
