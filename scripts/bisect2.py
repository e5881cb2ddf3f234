import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
def t(name, fn, *args):
    t0=time.time(); out = fn(*args); jax.block_until_ready(out); print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)

from deep_insight_face_tpu.ops.align import umeyama_similarity, ARCFACE_TEMPLATE_112
lms = jnp.asarray(rng.uniform(0,100,(8,5,2)).astype(np.float32))
tpl = jnp.asarray(ARCFACE_TEMPLATE_112)
t("umeyama_vmap", jax.jit(jax.vmap(lambda lm: umeyama_similarity(lm, tpl))), lms)
print("now full pipeline batch 4", flush=True)
from deep_insight_face_tpu.config import default_config
from deep_insight_face_tpu.models import build_embedding_model, init_embedding_params
from deep_insight_face_tpu.models.yolov3 import YoloV3
from deep_insight_face_tpu.pipeline import build_pipeline
cfg = default_config()
em = build_embedding_model(cfg.model)
ev = init_embedding_params(em, jax.random.key(0), 112)
det = YoloV3(num_classes=1)
dv = det.init(jax.random.key(1), jnp.zeros((1,416,416,3)))
run = build_pipeline(cfg, em, det)
imgs = jnp.asarray(rng.integers(0,255,(4,416,416,3),dtype=np.uint8))
t("pipeline_b4", run, dv, ev, imgs)
