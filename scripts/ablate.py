import sys, os; sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses, time, functools, numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
from deep_insight_face_tpu.pipeline import make_detector_model, _select_best_box
from deep_insight_face_tpu.detector.decode import decode_detections, correct_letterbox_boxes
from deep_insight_face_tpu.ops.nms import non_max_suppression
from deep_insight_face_tpu.ops.image import letterbox, preprocess
from deep_insight_face_tpu.ops.align import crop_resize_boxes

rng = np.random.default_rng(0)
B, CHAIN, REPS = 128, 8, 2
cfg = default_config()
cfg = cfg.replace(detector=dataclasses.replace(cfg.detector, variant="tiny"))
dc = cfg.detector
anchors = jnp.asarray(np.array(dc.anchors, np.float32))
dm, masks = make_detector_model(dc)
dv = dm.init(jax.random.key(1), jnp.zeros((1,416,416,3)))
em = build_embedding_model(cfg.model)
ev = init_embedding_params(em, jax.random.key(0), 112)

def upto(stage):
    def fn(x):
        h, w = x.shape[1], x.shape[2]
        boxed, meta = letterbox(x, dc.input_size)
        if stage == "letterbox": return jnp.sum(boxed)
        heads = dm.apply(dv, boxed/255., train=False)
        if stage == "heads": return sum(jnp.sum(hh) for hh in heads)
        rb, rs = decode_detections(heads, anchors, masks, 1, dc.input_size)
        if stage == "decode": return jnp.sum(rb)+jnp.sum(rs)
        fs = rs[..., 0]
        def one(bb, ss):
            ob, os_, v = non_max_suppression(bb, ss, max_boxes=dc.max_boxes,
                iou_threshold=dc.iou_threshold, score_threshold=dc.score_threshold)
            ob = correct_letterbox_boxes(ob, meta, dc.input_size, (h, w))
            return _select_best_box(ob, os_, v, (h, w))
        box, score, found = jax.vmap(one)(rb, fs)
        if stage == "nms": return jnp.sum(box)+jnp.sum(score)
        m = float(dc.bbox_margin)
        exp = jnp.stack([box[:,0]-m/2, box[:,1]-m/2, box[:,2]+m/2, box[:,3]+m/2], -1)
        crops = crop_resize_boxes(x, exp, (112,112))
        if stage == "crop": return jnp.sum(crops)
        emb = em.apply(ev, preprocess(crops, "tf"), train=False)
        return jnp.sum(emb)+jnp.sum(score)
    return fn

def measure(name, stage):
    body = upto(stage)
    @jax.jit
    def f(x):
        total = jnp.float32(0)
        for _ in range(CHAIN):
            r = body(x)
            x = x + r * 1e-20
            total = total + r
        return total
    batches = [jnp.asarray(rng.integers(0,255,(B,416,416,3),dtype=np.uint8)).astype(jnp.float32) for _ in range(REPS)]
    jax.block_until_ready(batches)
    float(f(batches[0]))
    t0 = time.perf_counter()
    vals = [float(f(b + 1.0)) for b in batches]
    dt = (time.perf_counter()-t0)/(CHAIN*REPS)*1000
    print(f"{name}: {dt:.1f} ms/batch", flush=True)

for s in ["letterbox", "heads", "decode", "nms", "crop", "full"]:
    measure(s, s)
