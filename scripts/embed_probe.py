import sys, os; sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
CHAIN, REPS = 4, 4

def measure(name, stage, make_input, B):
    @jax.jit
    def f(x):
        total = jnp.float32(0)
        for _ in range(CHAIN):
            r = stage(x)
            x = x + r * 1e-20
            total = total + r
        return total
    batches = [make_input() for _ in range(REPS)]
    jax.block_until_ready(batches)
    float(f(batches[0]))
    t0 = time.perf_counter()
    vals = [float(f(b + 1.0)) for b in batches]
    dt = (time.perf_counter() - t0) / (CHAIN * REPS) * 1000
    print(f"{name}: {dt:.2f} ms/batch ({B/dt*1000:.0f} img/s)", flush=True)

from deep_insight_face_tpu.config import ModelConfig
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params

for B in (32, 128):
    for backbone, head in [("resnet50v2", "gdc"), ("mobilenetv2", "gdc")]:
        cfg = ModelConfig(backbone=backbone, head=head)
        em = build_embedding_model(cfg)
        ev = init_embedding_params(em, jax.random.key(1), 112)
        mk = lambda: jnp.asarray(rng.normal(size=(B,112,112,3)).astype(np.float32))
        measure(f"{backbone}_B{B}", lambda x, em=em, ev=ev: jnp.sum(em.apply(ev, x, train=False)), mk, B)
