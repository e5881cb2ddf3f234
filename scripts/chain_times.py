import sys, os; sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time, functools, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
B, CHAIN, REPS = 32, 4, 4

from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
from deep_insight_face_tpu.models.yolov3 import YoloV3
from deep_insight_face_tpu.detector.decode import decode_detections, correct_letterbox_boxes
from deep_insight_face_tpu.ops.nms import non_max_suppression
from deep_insight_face_tpu.ops.image import letterbox, preprocess
from deep_insight_face_tpu.ops.align import crop_resize_boxes

cfg = default_config()
dc = cfg.detector
anchors = jnp.asarray(np.array(dc.anchors, np.float32))
det = YoloV3(num_classes=1)
dv = det.init(jax.random.key(0), jnp.zeros((1,416,416,3)))
em = build_embedding_model(cfg.model)
ev = init_embedding_params(em, jax.random.key(1), 112)

def stage_yolo(imgs):
    heads = det.apply(dv, imgs/255., train=False)
    return sum(jnp.sum(h) for h in heads)

def stage_yolo_decode(imgs):
    heads = det.apply(dv, imgs/255., train=False)
    b, s = decode_detections(heads, anchors, dc.anchor_masks, 1, dc.input_size)
    return jnp.sum(b) + jnp.sum(s)

def stage_to_nms(imgs):
    heads = det.apply(dv, imgs/255., train=False)
    b, s = decode_detections(heads, anchors, dc.anchor_masks, 1, dc.input_size)
    def one(bb, ss):
        ob, os_, v = non_max_suppression(bb, ss[...,0], max_boxes=20,
            iou_threshold=dc.iou_threshold, score_threshold=dc.score_threshold)
        return ob, os_
    ob, os_ = jax.vmap(one)(b, s)
    return jnp.sum(ob) + jnp.sum(os_)

def stage_embed_only(imgs):
    crops = crop_resize_boxes(imgs, jnp.tile(jnp.array([[50.,50.,350.,350.]]),(B,1)), (112,112))
    e = em.apply(ev, preprocess(crops, "tf"), train=False)
    return jnp.sum(e)

def chained(stage):
    @jax.jit
    def f(imgs):
        total = jnp.float32(0)
        x = imgs
        for _ in range(CHAIN):
            r = stage(x)
            x = x + r * 1e-20
            total = total + r
        return total
    return f

def measure(name, stage):
    f = chained(stage)
    batches = [jnp.asarray(rng.integers(0,255,(B,416,416,3),dtype=np.uint8)).astype(jnp.float32) for _ in range(REPS)]
    jax.block_until_ready(batches)
    float(f(batches[0]))  # compile
    t0 = time.perf_counter()
    outs = [f(b + 1.0) for b in batches]
    vals = [float(o) for o in outs]
    dt = (time.perf_counter() - t0) / (CHAIN * REPS) * 1000
    print(f"{name}: {dt:.2f} ms/batch ({B/dt*1000:.0f} img/s)", flush=True)

measure("yolo_only", stage_yolo)
measure("yolo+decode", stage_yolo_decode)
measure("yolo+decode+nms", stage_to_nms)
measure("warp+embed_only", stage_embed_only)
