import sys, os; sys.path.insert(0, "/root/repo")
import time, sys, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)

def t(name, fn, *args):
    t0=time.time(); out = fn(*args); jax.block_until_ready(out); print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for _ in range(3): out = fn(*args)
    jax.block_until_ready(out); print(f"{name}: steady {(time.time()-t0)/3:.3f}s", flush=True)

B=8
stage = sys.argv[1] if len(sys.argv)>1 else "all"
imgs = jnp.asarray(rng.integers(0,255,(B,416,416,3),dtype=np.uint8))

if stage in ("letterbox","all"):
    from deep_insight_face_tpu.ops.image import letterbox
    t("letterbox", jax.jit(lambda x: letterbox(x.astype(jnp.float32), 416)[0]), imgs)
if stage in ("yolo","all"):
    from deep_insight_face_tpu.models.yolov3 import YoloV3
    det = YoloV3(num_classes=1)
    dv = det.init(jax.random.key(0), jnp.zeros((1,416,416,3)))
    t("yolov3", jax.jit(lambda v,x: det.apply(v,x)[0]), dv, imgs.astype(jnp.float32)/255.)
if stage in ("nmsvmap","all"):
    from deep_insight_face_tpu.ops.nms import non_max_suppression
    boxes = jnp.asarray(rng.uniform(0,1,(B,10647,4)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0,1,(B,10647)).astype(np.float32))
    import jax as _j
    f = _j.jit(_j.vmap(lambda b,s: non_max_suppression(b,s,max_boxes=20)[0]))
    t("nms_vmap", f, boxes, scores)
if stage in ("warp","all"):
    from deep_insight_face_tpu.ops.align import warp_affine
    mats = jnp.tile(jnp.array([[1.5,0.,10.],[0.,1.5,5.]],jnp.float32)[None],(B,1,1))
    t("warp", jax.jit(lambda x,m: warp_affine(x, m, (112,112))), imgs.astype(jnp.float32), mats)
if stage in ("embed","all"):
    from deep_insight_face_tpu.config import ModelConfig
    from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
    cfg = ModelConfig()
    em = build_embedding_model(cfg)
    ev = init_embedding_params(em, jax.random.key(0), 112)
    x112 = jnp.asarray(rng.normal(size=(B,112,112,3)).astype(np.float32))
    t("resnet50_embed", jax.jit(lambda v,x: em.apply(v,x,train=False)), ev, x112)
print("DONE", flush=True)
