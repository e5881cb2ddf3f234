import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp, dataclasses
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.models.landmark import LandmarkNet
from deep_insight_face_tpu.pipeline import make_detector_model
from deep_insight_face_tpu.detector.decode import decode_detections
from deep_insight_face_tpu.ops.nms import non_max_suppression
from deep_insight_face_tpu.ops.image import letterbox, preprocess
from deep_insight_face_tpu.ops.align import crop_resize_boxes
from deep_insight_face_tpu.utils import pretrained

B, CH = 128, 8
cfg = default_config()
cfg = cfg.replace(detector=dataclasses.replace(cfg.detector, variant="tiny_s2d"))
det_cfg = cfg.detector
dm, masks = make_detector_model(det_cfg)
dv = pretrained.load_detector_variables("tiny_s2d", 416)
em = build_embedding_model(cfg.model)
ev = pretrained.load_embedder_variables("embedder_synth_resnet50v2")
anchors = jnp.asarray(np.array(det_cfg.anchors, np.float32))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 255, (B, 416, 416, 3), dtype=np.uint8)).astype(jnp.float32)

def timed(f, *a):
    g = jax.jit(f)
    out = g(*a); jax.block_until_ready(out); float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        o = g(*[q + float(i+1) if isinstance(q, jnp.ndarray) and q.dtype == jnp.float32 else q for q in a])
        float(jnp.sum(jax.tree.leaves(o)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

def chain(fn):
    def run(x):
        tot = jnp.float32(0)
        cur = x
        for _ in range(CH):
            o = fn(cur)
            s = jnp.sum(jax.tree.leaves(o)[0][:1].astype(jnp.float32))
            cur = cur + s * 1e-12
            tot = tot + s
        return tot
    return run

# stage 1: letterbox only
print(f"letterbox:        {timed(chain(lambda z: letterbox(z, 416)[0]), x)/CH*1000:7.2f} ms", flush=True)
# stage 2: + detector fwd
def det_fwd(z):
    boxed, meta = letterbox(z, 416)
    return dm.apply(dv, boxed / 255.0, train=False)
print(f"+detector fwd:    {timed(chain(det_fwd), x)/CH*1000:7.2f} ms", flush=True)
# stage 3: + decode
def det_decode(z):
    boxed, meta = letterbox(z, 416)
    heads = dm.apply(dv, boxed / 255.0, train=False)
    rb, rs = decode_detections(heads, anchors, masks, 1, 416)
    return rb
print(f"+decode:          {timed(chain(det_decode), x)/CH*1000:7.2f} ms", flush=True)
# stage 4: + NMS
def det_nms(z):
    boxed, meta = letterbox(z, 416)
    heads = dm.apply(dv, boxed / 255.0, train=False)
    rb, rs = decode_detections(heads, anchors, masks, 1, 416)
    def per(b, s):
        ob, os_, v = non_max_suppression(b, s[..., 0], max_boxes=det_cfg.max_boxes,
            iou_threshold=det_cfg.iou_threshold, score_threshold=det_cfg.score_threshold,
            approx_topk=True)
        return ob
    return jax.vmap(per)(rb, rs)
print(f"+NMS:             {timed(chain(det_nms), x)/CH*1000:7.2f} ms", flush=True)
# embed alone on crops
crops = jnp.asarray(rng.integers(0, 255, (B, 112, 112, 3), dtype=np.uint8)).astype(jnp.float32)
print(f"embed resnet:     {timed(chain(lambda c: em.apply(ev, preprocess(c, 'tf'), train=False)), crops)/CH*1000:7.2f} ms", flush=True)
# crop_resize from full frame
boxes = jnp.tile(jnp.asarray([50., 60., 350., 380.], jnp.float32), (B, 1))
print(f"crop_resize 416→112: {timed(chain(lambda z: crop_resize_boxes(z, boxes, (112,112))), x)/CH*1000:7.2f} ms", flush=True)
