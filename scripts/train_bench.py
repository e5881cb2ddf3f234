"""Training-step throughput on the real chip: ArcFace ResNet50V2 @112.

Chained-in-jit measurement (same honest methodology as bench.py).
Usage: python scripts/train_bench.py [batch] [mode]
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.config import Config, ModelConfig, TrainConfig
    from deep_insight_face_tpu.models import build_embedding_model
    from deep_insight_face_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "arcface"
    platform = jax.devices()[0].platform

    cfg = Config(
        model=ModelConfig(backbone="resnet50v2", head="gdc", embedding_size=128,
                          image_size=112),
        train=TrainConfig(mode=mode, num_classes=10_000, warmup_steps=0),
    )
    model = build_embedding_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(cfg, mesh=None)

    rng = np.random.default_rng(0)

    def make_batch(seed):
        return {
            "images": jnp.asarray(
                rng.normal(size=(batch, 112, 112, 3)).astype(np.float32)
            ),
            "labels": jnp.asarray(
                rng.integers(0, cfg.train.num_classes, batch).astype(np.int32)
            ),
        }

    batches = [make_batch(i) for i in range(3)]
    state, m = step(state, batches[0])  # compile
    float(m["loss"])

    iters = 6 if platform == "tpu" else 2
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batches[i % len(batches)])
    loss = float(m["loss"])  # fetch forces completion of the chain
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "arcface_train_throughput",
        "value": round(batch * iters / dt, 1),
        "unit": "img/sec/chip",
        "mode": mode,
        "batch": batch,
        "step_ms": round(dt / iters * 1000, 1),
        "loss": round(loss, 3),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
