"""Detector forward-only shootout (honest chained timing, real chip).

Usage: python scripts/det_fwd_bench.py [variant ...]
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses, time, numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.pipeline import make_detector_model

B = int(os.environ.get("DET_BENCH_BATCH", "128"))
CHAIN = int(os.environ.get("DET_BENCH_CHAIN", "8"))
REPS = int(os.environ.get("DET_BENCH_REPS", "3"))
SIZE = int(os.environ.get("DET_BENCH_SIZE", "416"))
rng = np.random.default_rng(0)
variants = sys.argv[1:] or ["tiny_s2d", "tiny_mx"]
for variant in variants:
    cfg = default_config()
    det = dataclasses.replace(cfg.detector, variant=variant)
    m, _ = make_detector_model(det)
    v = m.init(jax.random.key(1), jnp.zeros((1, SIZE, SIZE, 3)))

    @jax.jit
    def f(v, x, eps):
        # unique-input perturbation rides INSIDE the jitted program — an
        # eager `b + eps` here would be its own device dispatch and cost
        # an extra tunnel round trip per sample inside the timed region
        # (the same harness mistake that manufactured the r2 "p50
        # regression"; see bench.py measure()).
        x = x + eps
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            heads = m.apply(v, x)
            s = sum(jnp.sum(h) for h in heads)
            acc = acc + s
            x = x + (s * 1e-20).astype(x.dtype)  # data dependency
        return acc
    batches = [jnp.asarray(rng.random((B, SIZE, SIZE, 3), np.float32)) for _ in range(REPS)]
    jax.block_until_ready(batches)
    float(f(v, batches[0], jnp.float32(0.0)))  # compile
    best = float("inf")
    for r in range(4):
        eps = jnp.float32(r + 1)  # (b, eps) unique across all rounds
        t0 = time.perf_counter()
        outs = [f(v, b, eps) for b in batches]  # dispatch all, overlap RTTs
        for o in outs:
            float(o)  # fetching to host proves execution (CLAUDE.md)
        best = min(best, time.perf_counter() - t0)
    dt = best / (CHAIN * REPS)
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    print(f"{variant}: {dt*1000:.2f} ms/batch-{B} fwd ({n_params/1e6:.2f}M params)", flush=True)
