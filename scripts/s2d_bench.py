import sys, os; sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses, time, numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
from deep_insight_face_tpu.pipeline import build_benchmark_fn, make_detector_model
rng = np.random.default_rng(0)
B, CHAIN, REPS = 128, 8, 3
for variant in ["tiny_s2d", "tiny"]:
    cfg = default_config()
    cfg = cfg.replace(detector=dataclasses.replace(cfg.detector, variant=variant))
    em = build_embedding_model(cfg.model)
    ev = init_embedding_params(em, jax.random.key(0), 112)
    dm, _ = make_detector_model(cfg.detector)
    dv = dm.init(jax.random.key(1), jnp.zeros((1, 416, 416, 3)))
    f = build_benchmark_fn(cfg, em, dm, iters=CHAIN)
    batches = [jnp.asarray(rng.integers(0,255,(B,416,416,3),dtype=np.uint8)).astype(jnp.float32) for _ in range(REPS)]
    jax.block_until_ready(batches)
    float(f(dv, ev, batches[0]))
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        vals = [float(f(dv, ev, b + float(r+1))) for b in batches]
        best = min(best, time.perf_counter() - t0)
    dt = best / (CHAIN * REPS)
    print(f"{variant}: {dt*1000:.2f} ms/batch -> {B/dt:.0f} faces/s", flush=True)
