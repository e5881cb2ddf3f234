import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
import dataclasses
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
from deep_insight_face_tpu.models.landmark import LandmarkNet
from deep_insight_face_tpu.pipeline import build_benchmark_fn, make_detector_model
from deep_insight_face_tpu.ops.align import warp_affine, umeyama_similarity, ARCFACE_TEMPLATE_112

B = 128
cfg = default_config()
cfg = cfg.replace(detector=dataclasses.replace(cfg.detector, variant="tiny_s2d"))
em = build_embedding_model(cfg.model)
ev = init_embedding_params(em, jax.random.key(0), cfg.model.image_size)
dm, _ = make_detector_model(cfg.detector)
dv = dm.init(jax.random.key(1), jnp.zeros((1, 416, 416, 3)))
lm = LandmarkNet()
lv = lm.init(jax.random.key(2), jnp.zeros((1, 112, 112, 3)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 255, (B, 416, 416, 3), dtype=np.uint8)).astype(jnp.float32)

def timed(fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out); float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for i in range(iters):
        a2 = [a + float(i+1) if isinstance(a, jnp.ndarray) and a.dtype==jnp.float32 else a for a in args]
        t0 = time.perf_counter()
        out = fn(*a2)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

# full pipelines, chained x4
CH = 4
for mode in ("box", "landmark"):
    bench = build_benchmark_fn(cfg, em, dm, iters=CH, align=mode, landmark_model=lm)
    v = {"detector": dv, "embed": ev} | ({"landmark": lv} if mode == "landmark" else {})
    t = timed(lambda vv, xx: bench(vv, xx), v, x)
    print(f"pipeline {mode}: {t/CH*1000:.2f} ms/batch", flush=True)

# isolated: LandmarkNet fwd
crops = jnp.asarray(rng.integers(0, 255, (B, 112, 112, 3), dtype=np.uint8)).astype(jnp.float32)
@jax.jit
def lmf(v, c):
    out = c
    for i in range(CH):
        lmk = lm.apply(v, out / 127.5 - 1.0, train=False)
        out = out + jnp.sum(lmk) * 1e-12
    return jnp.sum(out)
print(f"landmarknet fwd: {timed(lmf, lv, crops)/CH*1000:.2f} ms/batch", flush=True)

# isolated: gather warp 112<-112
mats = jnp.tile(jnp.asarray([[0.98, -0.05, 3.0], [0.05, 0.98, -2.0]], jnp.float32), (B, 1, 1))
@jax.jit
def wf(c, m):
    out = c
    for i in range(CH):
        w = warp_affine(out, m, (112, 112))
        out = out + w * 1e-12
    return jnp.sum(out)
print(f"gather warp_affine 112: {timed(wf, crops, mats)/CH*1000:.2f} ms/batch", flush=True)

# isolated: umeyama
five = jnp.asarray(rng.normal(size=(B, 5, 2)).astype(np.float32) * 20 + 56)
@jax.jit
def uf(f):
    out = f
    for i in range(CH):
        m = jax.vmap(lambda ff: umeyama_similarity(ff, jnp.asarray(ARCFACE_TEMPLATE_112)))(out)
        out = out + jnp.sum(m) * 1e-12
    return jnp.sum(out)
print(f"umeyama x128: {timed(uf, five)/CH*1000:.2f} ms/batch", flush=True)

from deep_insight_face_tpu.ops.align import warp_affine_mxu
@jax.jit
def wf2(c, m):
    out = c
    for i in range(CH):
        w = warp_affine_mxu(out, m, (112, 112))
        out = out + w * 1e-12
    return jnp.sum(out)
print(f"mxu warp_affine 112: {timed(wf2, crops, mats)/CH*1000:.2f} ms/batch", flush=True)
