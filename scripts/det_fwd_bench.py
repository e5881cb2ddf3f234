"""Detector forward-only shootout (honest chained timing, real chip).

Usage: python scripts/det_fwd_bench.py [variant ...]
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses, time, numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.pipeline import make_detector_model

B, CHAIN, REPS = 128, 8, 3
rng = np.random.default_rng(0)
variants = sys.argv[1:] or ["tiny_s2d", "tiny_mx"]
for variant in variants:
    cfg = default_config()
    det = dataclasses.replace(cfg.detector, variant=variant)
    m, _ = make_detector_model(det)
    v = m.init(jax.random.key(1), jnp.zeros((1, 416, 416, 3)))

    @jax.jit
    def f(v, x):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            heads = m.apply(v, x)
            s = sum(jnp.sum(h) for h in heads)
            acc = acc + s
            x = x + (s * 1e-20).astype(x.dtype)  # data dependency
        return acc
    batches = [jnp.asarray(rng.random((B, 416, 416, 3), np.float32)) for _ in range(REPS)]
    jax.block_until_ready(batches)
    float(f(v, batches[0]))  # compile
    best = float("inf")
    for r in range(4):
        t0 = time.perf_counter()
        for b in batches:
            float(f(v, b + float(r + 1)))
        best = min(best, time.perf_counter() - t0)
    dt = best / (CHAIN * REPS)
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    print(f"{variant}: {dt*1000:.2f} ms/batch-{B} fwd ({n_params/1e6:.2f}M params)", flush=True)
