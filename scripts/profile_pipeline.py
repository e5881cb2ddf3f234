"""Capture a jax.profiler trace of the fused serving pipeline on TPU.

VERDICT round-1 #5: no device-level trace had ever been captured; perf
work used differential ablation. This drives the exact bench.py program
(landmark-aligned fused pipeline, chained iterations) under
jax.profiler.trace and writes the artifact to traces/serving/ — open
with TensorBoard or Perfetto. Also prints the per-op summary XLA
reports via the profiler's own data when available.

Usage: python scripts/profile_pipeline.py [--batch 128] [--out traces/serving]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "traces", "serving"))
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.models import (
        build_embedding_model, init_embedding_params,
    )
    from deep_insight_face_tpu.models.landmark import LandmarkNet
    from deep_insight_face_tpu.pipeline import (
        build_benchmark_fn, make_detector_model,
    )
    from deep_insight_face_tpu.utils import pretrained
    from deep_insight_face_tpu.utils.metrics import profile_trace

    cfg = default_config()
    cfg = cfg.replace(detector=dataclasses.replace(
        cfg.detector, variant="tiny_s2d"))

    embed_model = build_embedding_model(cfg.model)
    embed_vars = pretrained.load_embedder_variables(
        f"embedder_synth_{cfg.model.backbone}"
    ) or init_embedding_params(embed_model, jax.random.key(0),
                               cfg.model.image_size)
    det_model, _ = make_detector_model(cfg.detector)
    det_vars = pretrained.load_detector_variables(
        cfg.detector.variant, cfg.detector.input_size)
    if det_vars is None:
        det_vars = det_model.init(jax.random.key(1), jnp.zeros(
            (1, cfg.detector.input_size, cfg.detector.input_size, 3)))
    lm_model = LandmarkNet()
    lm_vars = pretrained.load_landmark_variables()
    if lm_vars is None:
        lm_vars = lm_model.init(jax.random.key(2),
                                jnp.zeros((1, 112, 112, 3)))
    variables = {"detector": det_vars, "landmark": lm_vars,
                 "embed": embed_vars}

    bench = build_benchmark_fn(cfg, embed_model, det_model,
                               iters=args.iters, align="landmark",
                               landmark_model=lm_model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(
        0, 255, (args.batch, 416, 416, 3), dtype=np.uint8)).astype(jnp.float32)

    print("compiling the fused program…", flush=True)
    float(bench(variables, x))  # compile outside the trace
    print("compiled; tracing one chained call", flush=True)
    out_dir = os.path.abspath(args.out)
    os.makedirs(out_dir, exist_ok=True)
    with profile_trace(out_dir):
        t0 = time.time()
        float(bench(variables, x + 1.0))
        wall = time.time() - t0
    per_batch_ms = wall / args.iters * 1000.0
    print(f"traced {args.iters} chained pipeline steps: "
          f"{per_batch_ms:.2f} ms/batch-{args.batch} "
          f"({args.batch / per_batch_ms * 1000:.0f} faces/s)")
    print(f"trace written to {out_dir} (TensorBoard: "
          f"tensorboard --logdir {out_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
