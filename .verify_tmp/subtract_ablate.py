import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp, dataclasses
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.models.landmark import LandmarkNet
from deep_insight_face_tpu.pipeline import make_detector_model, _select_best_box
from deep_insight_face_tpu.detector.decode import decode_detections
from deep_insight_face_tpu.ops.nms import non_max_suppression
from deep_insight_face_tpu.ops.image import letterbox, preprocess
from deep_insight_face_tpu.ops.align import (
    crop_resize_boxes, warp_affine_mxu, umeyama_similarity, five_from_68,
    ARCFACE_TEMPLATE_112,
)
from deep_insight_face_tpu.utils import pretrained

B, CH = 128, 8
cfg = default_config()
det_cfg = dataclasses.replace(cfg.detector, variant="tiny_s2d")
dm, masks = make_detector_model(det_cfg)
dv = pretrained.load_detector_variables("tiny_s2d", 416)
em = build_embedding_model(cfg.model)
ev = pretrained.load_embedder_variables("embedder_synth_resnet50v2")
lmm = LandmarkNet()
lmv = pretrained.load_landmark_variables()
anchors = jnp.asarray(np.array(det_cfg.anchors, np.float32))
tpl = jnp.asarray(ARCFACE_TEMPLATE_112)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(0, 255, (B, 416, 416, 3), dtype=np.uint8)).astype(jnp.float32)

def detect(xf, skip_nms):
    boxed, meta = letterbox(xf, 416)
    heads = dm.apply(dv, boxed / 255.0, train=False)
    rb, rs = decode_detections(heads, anchors, masks, 1, 416)
    fs = rs[..., 0]
    if skip_nms:
        i = jnp.argmax(fs.reshape(B, -1), axis=1)
        bb = jnp.take_along_axis(rb.reshape(B, -1, 4), i[:, None, None], 1)[:, 0]
        return bb, jnp.ones((B,), bool)
    def per(b, s):
        ob, os_, v = non_max_suppression(b, s, max_boxes=det_cfg.max_boxes,
            iou_threshold=det_cfg.iou_threshold,
            score_threshold=det_cfg.score_threshold, approx_topk=True)
        return _select_best_box(ob, os_, v, (416, 416))
    bb, sc, fo = jax.vmap(per)(rb, fs)
    return bb, fo

def lm_stage(xf, box, skip):
    m = 8.0
    eb = jnp.stack([box[:,0]-m/2, box[:,1]-m/2, box[:,2]+m/2, box[:,3]+m/2], -1)
    crops = crop_resize_boxes(xf, eb, (112, 112))
    if skip:
        return crops
    lm = lmm.apply(lmv, preprocess(crops, "tf"), train=False)
    five = five_from_68(lm) * 112
    mats = jax.vmap(lambda f: umeyama_similarity(f, tpl))(five)
    return warp_affine_mxu(crops, mats, (112, 112))

def make(skip_det=False, skip_nms=False, skip_lm=False, skip_embed=False):
    def step(xf):
        if skip_det:
            box = jnp.tile(jnp.asarray([60., 60., 360., 360.]), (B, 1))
        else:
            box, fo = detect(xf, skip_nms)
        crops = lm_stage(xf, box, skip_lm)
        if skip_embed:
            return jnp.sum(crops) * 1e-6
        emb = em.apply(ev, preprocess(crops, "tf"), train=False)
        return jnp.sum(emb)
    @jax.jit
    def bench(xf):
        tot = jnp.float32(0)
        cur = xf
        for _ in range(CH):
            s = step(cur)
            cur = cur + s * 1e-12
            tot = tot + s
        return tot
    return bench

def timed(f):
    float(f(x0))
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); float(f(x0 + float(i+1))); ts.append(time.perf_counter()-t0)
    return min(ts) / CH * 1000

print(f"full landmark pipeline : {timed(make()):7.2f} ms", flush=True)
print(f"  - NMS (argmax box)   : {timed(make(skip_nms=True)):7.2f} ms", flush=True)
print(f"  - landmark stage     : {timed(make(skip_lm=True)):7.2f} ms", flush=True)
print(f"  - embed              : {timed(make(skip_embed=True)):7.2f} ms", flush=True)
print(f"  - detector (fixed bx): {timed(make(skip_det=True)):7.2f} ms", flush=True)
print(f"  - det & lm           : {timed(make(skip_det=True, skip_lm=True)):7.2f} ms", flush=True)
