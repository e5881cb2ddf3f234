"""Headline benchmark: end-to-end detect → align → embed throughput on
one chip (BASELINE.json metric: faces/sec/chip, target ≥5000 on v5e).

Runs the fused serving pipeline (deep_insight_face_tpu.pipeline): YOLOv3
@416 detect + decode + Pallas NMS + similarity-align to 112 + ResNet50V2
GDC 128-D embed, all inside one jit, uint8 in / embeddings out.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", ...}
``vs_baseline`` is the multiple of the reference's estimated TF2-CPU
throughput (250 faces/sec — BASELINE.md derives the 5k target as ≥20×
that reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the fused pipeline is a large program and the
# remote TPU compile is slow — cache it across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REFERENCE_FACES_PER_SEC = 250.0  # TF2-CPU estimate: 5000 target / 20×


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.models import (
        build_embedding_model,
        init_embedding_params,
    )
    from deep_insight_face_tpu.models.yolov3 import YoloV3
    from deep_insight_face_tpu.pipeline import build_benchmark_fn

    cfg = default_config()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    platform = jax.devices()[0].platform
    iters = 20 if platform == "tpu" else 2

    embed_model = build_embedding_model(cfg.model)
    embed_vars = init_embedding_params(
        embed_model, jax.random.key(0), cfg.model.image_size
    )
    det_model = YoloV3(num_classes=cfg.detector.num_classes)
    det_vars = det_model.init(
        jax.random.key(1),
        jnp.zeros((1, cfg.detector.input_size, cfg.detector.input_size, 3)),
    )

    # iters chained pipeline steps inside ONE jit: each step's input
    # depends on the previous output, so every iteration truly executes
    # (no value-caching, no per-call host round-trips in the middle)
    bench = build_benchmark_fn(cfg, embed_model, det_model, iters=iters)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, 416, 416, 3), dtype=np.uint8)
    ).astype(jnp.float32)

    out = bench(det_vars, embed_vars, images)  # warmup / compile
    jax.block_until_ready(out)

    start = time.perf_counter()
    out = bench(det_vars, embed_vars, images + 1.0)
    jax.block_until_ready(out)
    float(out)  # force the result back to the host
    elapsed = time.perf_counter() - start

    faces_per_sec = batch * iters / elapsed
    p50_latency_ms = elapsed / iters * 1000.0

    print(
        json.dumps(
            {
                "metric": "detect_align_embed_throughput",
                "value": round(faces_per_sec, 2),
                "unit": "faces/sec/chip",
                "vs_baseline": round(faces_per_sec / REFERENCE_FACES_PER_SEC, 3),
                "batch": batch,
                "batch_latency_ms": round(p50_latency_ms, 2),
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()
