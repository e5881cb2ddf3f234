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
    print(f"  done in {time.time() - t0:.0f}s", flush=True)

    model = LandmarkNet(width=args.width)
    warmup = min(100, args.steps // 4)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps + warmup
    )
    state = create_landmark_state(
        model, jax.random.key(args.seed), args.size, learning_rate=schedule
    )
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
    preds = []
    for s in range(0, len(ev_imgs), 128):
        preds.append(np.asarray(
            infer(variables, jnp.asarray(ev_imgs[s : s + 128], jnp.float32))
        ))
    pred = np.concatenate(preds)
    nme = float(normalized_mean_error(jnp.asarray(pred), jnp.asarray(ev_lms)))

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
