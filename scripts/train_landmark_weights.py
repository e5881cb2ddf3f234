"""Train the shipped LandmarkNet weights on the procedural face world.

Produces deep_insight_face_tpu/weights/landmark_68.npz — the default
weights api.FaceRecognition loads for 68-pt landmark detection
(replacing the reference's external face_landmark_detector dependency,
reference: api.py:17-25) — plus a JSON sidecar recording held-out NME
vs the template-projection fallback baseline.

Usage: python scripts/train_landmark_weights.py [--steps 4000]
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
import optax


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--train-n", type=int, default=4000)
    ap.add_argument("--eval-n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hard-frac", type=float, default=0.0,
                    help="fraction of training crops rendered with the hard "
                         "e2e protocol's stress axes (wide in-plane pose + "
                         "opaque facial occluders, amodal labels); a hard "
                         "held-out NME is reported whenever > 0")
    ap.add_argument("--rotation-range", type=float, default=0.5,
                    help="in-plane pose range (radians) for the hard "
                         "fraction (matches scripts/e2e_quality.py --hard)")
    ap.add_argument("--occlude", type=float, default=0.5,
                    help="occluder probability for the hard fraction")
    ap.add_argument("--init-from", default=None,
                    help="warm-start params/batch_stats from an existing "
                         "landmark npz instead of random init")
    ap.add_argument(
        "--output",
        default=os.path.join(
            os.path.dirname(__file__), "..", "deep_insight_face_tpu",
            "weights", "landmark_68.npz",
        ),
    )
    args = ap.parse_args()

    from deep_insight_face_tpu.data.synthetic import landmark_crop_dataset
    from deep_insight_face_tpu.models.landmark import LandmarkNet
    from deep_insight_face_tpu.ops.landmark_loss import normalized_mean_error
    from deep_insight_face_tpu.ops.image import preprocess
    from deep_insight_face_tpu.ops.templates import MINMAX_TEMPLATE
    from deep_insight_face_tpu.training.landmark import (
        create_landmark_state,
        make_landmark_train_step,
    )
    from deep_insight_face_tpu.utils.weights import save_npz

    t0 = time.time()
    print(f"generating {args.train_n}+{args.eval_n} serving-geometry crops…",
          flush=True)
    imgs, lms = landmark_crop_dataset(
        args.train_n + args.eval_n, size=args.size, seed=args.seed
    )
    tr_imgs, ev_imgs = imgs[: args.train_n], imgs[args.train_n :]
    tr_lms, ev_lms = lms[: args.train_n], lms[args.train_n :]
    ev_hard_imgs = ev_hard_lms = None
    if args.hard_frac > 0.0:
        n_hard = int(round(args.train_n * args.hard_frac))
        print(f"generating {n_hard}+{args.eval_n} hard-stress crops "
              f"(rotation ±{args.rotation_range}, occlude "
              f"{args.occlude})…", flush=True)
        h_imgs, h_lms = landmark_crop_dataset(
            n_hard + args.eval_n, size=args.size, seed=args.seed + 7001,
            rotation_range=args.rotation_range, occlude=args.occlude,
        )
        # replace a slice of the standard stream (keeps train_n and the
        # index space the sampler draws from unchanged)
        tr_imgs = np.concatenate([tr_imgs[: args.train_n - n_hard],
                                  h_imgs[:n_hard]])
        tr_lms = np.concatenate([tr_lms[: args.train_n - n_hard],
                                 h_lms[:n_hard]])
        ev_hard_imgs, ev_hard_lms = h_imgs[n_hard:], h_lms[n_hard:]
    print(f"  done in {time.time() - t0:.0f}s", flush=True)

    model = LandmarkNet(width=args.width)
    warmup = min(100, args.steps // 4)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps + warmup
    )
    state = create_landmark_state(
        model, jax.random.key(args.seed), args.size, learning_rate=schedule
    )
    if args.init_from:
        from deep_insight_face_tpu.utils.weights import load_npz

        ivars = load_npz(args.init_from)
        state = state.replace(
            params=ivars["params"],
            batch_stats=ivars.get("batch_stats", state.batch_stats),
        )
        print(f"warm start from {os.path.basename(args.init_from)}",
              flush=True)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"LandmarkNet width={args.width}: {n_params/1e6:.2f}M params",
          flush=True)
    step = make_landmark_train_step()

    # Per-dispatch round-trips through the axon tunnel cost ~1 s; chain
    # CHUNK steps inside one jitted call (Python-unrolled — lax.scan
    # compiles pathologically slowly on the remote toolchain).
    chunk = min(8, args.steps)

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
        # ship uint8 through the tunnel (4× less transfer); the train
        # step's preprocessing casts on device
        batches = {
            "images": jnp.asarray(tr_imgs[idx]),
            "landmarks": jnp.asarray(tr_lms[idx]),
        }
        state, metrics = multi_step(state, batches)
        done = (i + 1) * chunk
        if (i + 1) % max(n_chunks // 20, 1) == 0:
            print(
                f"step {done}/{args.steps} loss {float(metrics['loss']):.4f} "
                f"train-NME {float(metrics['nme']):.4f} "
                f"({(time.time()-t0)/done*1000:.0f} ms/step)",
                flush=True,
            )

    # held-out NME (batched to bound memory), serving preprocessing
    @jax.jit
    def infer(variables, x):
        return model.apply(variables, preprocess(x, "tf"), train=False)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def heldout_nme(images, labels):
        preds = []
        for s in range(0, len(images), 128):
            preds.append(np.asarray(infer(
                variables, jnp.asarray(images[s : s + 128], jnp.float32)
            )))
        return float(normalized_mean_error(
            jnp.asarray(np.concatenate(preds)), jnp.asarray(labels)
        ))

    nme = heldout_nme(ev_imgs, ev_lms)
    nme_hard = None
    if ev_hard_imgs is not None:
        nme_hard = heldout_nme(ev_hard_imgs, ev_hard_lms)
        print(f"held-out HARD NME {nme_hard:.4f} (pose ±"
              f"{args.rotation_range}, occlude {args.occlude})", flush=True)

    # fallback baseline: project the OpenFace template into the crop
    # (exactly api.raw_landmarks without weights)
    tpl = np.asarray(MINMAX_TEMPLATE, np.float32)[None].repeat(len(ev_lms), 0)
    nme_tpl = float(
        normalized_mean_error(jnp.asarray(tpl), jnp.asarray(ev_lms))
    )
    print(f"held-out NME {nme:.4f} vs template-projection {nme_tpl:.4f} "
          f"({nme_tpl / max(nme, 1e-9):.1f}× better)", flush=True)

    out = os.path.abspath(args.output)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_npz(out, {"params": state.params, "batch_stats": state.batch_stats})
    meta = {
        "width": args.width,
        "image_size": args.size,
        "steps": args.steps,
        "train_n": args.train_n,
        "eval_n": args.eval_n,
        "heldout_nme": nme,
        "heldout_nme_hard": nme_hard,
        "hard_frac": args.hard_frac,
        "template_projection_nme": nme_tpl,
        "params_m": n_params / 1e6,
        "platform": jax.devices()[0].platform,
    }
    with open(out.replace(".npz", ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
