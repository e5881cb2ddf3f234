"""Build the hard-finetune harvest cache for the flagship embedder.

Harvests crops through the REAL serving pipeline (shipped tiny_mx +
LandmarkNet + align) from BOTH the hard-protocol scene distribution
(small faces 0.15-0.35, rotation 0.5, occlusion 0.5 — exactly
scripts/e2e_quality.py --hard) and the standard one, plus aligned
renders, into one train set sharing a label space. Held-out eval crops
come from the hard distribution (disjoint ids) so the script-reported
metrics predict hard e2e quality.

CPU-runnable (renders in a worker pool; inference is tiny_mx) so the
harvest can proceed while the TPU tunnel is down; the ResNet fine-tune
then consumes the cache on chip via
  scripts/train_embedder_weights.py --harvest-cache <path> …
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-ids", type=int, default=300)
    ap.add_argument("--per-id-hard", type=int, default=8)
    ap.add_argument("--per-id-std", type=int, default=6)
    ap.add_argument("--per-id-aligned", type=int, default=6)
    ap.add_argument("--eval-ids", type=int, default=50)
    ap.add_argument("--eval-per-id", type=int, default=6)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--scene-size", type=int, default=416)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from deep_insight_face_tpu.data.synthetic import (
        aligned_identity_dataset, pipeline_emitted_dataset,
    )

    hard_kw = dict(min_face=0.15, max_face=0.35, rotation_range=0.5,
                   occlude=0.5)
    std_kw = dict(min_face=0.25, max_face=0.45, rotation_range=0.25,
                  occlude=0.0)
    common = dict(size=args.size, scene_size=args.scene_size,
                  workers=args.workers)

    t0 = time.time()
    parts, labels = [], []
    tr_h, lab_h, rate_h = pipeline_emitted_dataset(
        args.n_ids, args.per_id_hard, seed=args.seed, **hard_kw, **common)
    parts.append(tr_h)
    labels.append(lab_h)
    print(f"hard train crops: {len(tr_h)} (det rate {rate_h:.3f}, "
          f"{time.time()-t0:.0f}s)", flush=True)

    if args.per_id_std > 0:
        tr_s, lab_s, rate_s = pipeline_emitted_dataset(
            args.n_ids, args.per_id_std, seed=args.seed + 3, **std_kw,
            **common)
        parts.append(tr_s)
        labels.append(lab_s)
        print(f"std train crops: {len(tr_s)} (det rate {rate_s:.3f}, "
              f"{time.time()-t0:.0f}s)", flush=True)

    if args.per_id_aligned > 0:
        tr_a, lab_a = aligned_identity_dataset(
            args.n_ids, args.per_id_aligned, size=args.size,
            seed=args.seed + 5)
        parts.append(tr_a)
        labels.append(lab_a)
        print(f"aligned train renders: {len(tr_a)}", flush=True)

    ev, ev_lab, ev_rate = pipeline_emitted_dataset(
        args.eval_ids, args.eval_per_id, seed=args.seed + 1,
        id_offset=10_000_000, **hard_kw, **common)
    print(f"hard eval crops: {len(ev)} (det rate {ev_rate:.3f})", flush=True)

    tr_imgs = np.concatenate(parts)
    tr_labels = np.concatenate(labels)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    np.savez_compressed(args.output, tr_imgs=tr_imgs, tr_labels=tr_labels,
                        ev_imgs=ev, ev_labels=ev_lab)
    print(f"saved {args.output}: {len(tr_imgs)} train + {len(ev)} eval "
          f"crops in {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
