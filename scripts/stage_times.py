import sys, os; sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
B = 32

def bench(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters*1000
    print(f"{name}: {dt:.2f} ms/batch ({B/dt*1000:.0f} img/s)", flush=True)

imgs_u8 = jnp.asarray(rng.integers(0,255,(B,416,416,3),dtype=np.uint8))
imgs = imgs_u8.astype(jnp.float32)

from deep_insight_face_tpu.ops.image import letterbox
bench("letterbox416", jax.jit(lambda x: letterbox(x, 416)[0]), imgs)

from deep_insight_face_tpu.models.yolov3 import YoloV3
det = YoloV3(num_classes=1)
dv = det.init(jax.random.key(0), jnp.zeros((1,416,416,3)))
bench("yolov3_fwd", jax.jit(lambda v,x: det.apply(v,x)[0]), dv, imgs/255.)

from deep_insight_face_tpu.detector.decode import decode_detections
from deep_insight_face_tpu.config import DetectorConfig
dc = DetectorConfig()
anchors = jnp.asarray(np.array(dc.anchors, np.float32))
heads = jax.jit(lambda v,x: det.apply(v,x))(dv, imgs/255.)
bench("decode", jax.jit(lambda h: decode_detections(h, anchors, dc.anchor_masks, 1, 416)[0]), heads)

from deep_insight_face_tpu.ops.nms import non_max_suppression
boxes = jnp.asarray(rng.uniform(0,1,(B,10647,4)).astype(np.float32))
scores = jnp.asarray(rng.uniform(0,1,(B,10647)).astype(np.float32))
bench("nms_vmap", jax.jit(jax.vmap(lambda b,s: non_max_suppression(b,s,max_boxes=20)[0])), boxes, scores)
bench("topk_only", jax.jit(jax.vmap(lambda s: jax.lax.top_k(s, 256)[0])), scores)

from deep_insight_face_tpu.ops.align import warp_affine
mats = jnp.tile(jnp.array([[1.5,0.,10.],[0.,1.5,5.]],jnp.float32)[None],(B,1,1))
bench("warp_gather", jax.jit(lambda x,m: warp_affine(x, m, (112,112))), imgs, mats)

from deep_insight_face_tpu.config import ModelConfig
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
em = build_embedding_model(ModelConfig())
ev = init_embedding_params(em, jax.random.key(0), 112)
x112 = jnp.asarray(rng.normal(size=(B,112,112,3)).astype(np.float32))
bench("resnet50_embed", jax.jit(lambda v,x: em.apply(v,x,train=False)), ev, x112)
