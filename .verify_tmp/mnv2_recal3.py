import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from deep_insight_face_tpu.data.synthetic import aligned_identity_dataset
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.ops.image import preprocess
from deep_insight_face_tpu.parallel.train_step import create_train_state, make_train_step

cfg = Config(
    model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=128,
                      image_size=112, width_multiplier=1.0),
    data=DataConfig(batch_size=64, augmentation="none"),
    train=TrainConfig(mode="arcface", num_classes=400, learning_rate=1e-3,
                      warmup_steps=200),
)
tr_imgs, tr_labels = aligned_identity_dataset(400, 16, size=112, seed=0)
ev_imgs, ev_labels = aligned_identity_dataset(16, 4, size=112, seed=1, id_offset=10_000_000)
model = build_embedding_model(cfg.model)
state = create_train_state(model, cfg, jax.random.key(0))
step = make_train_step(cfg)
chunk = 8
@jax.jit
def multi(state, images_u8, labels):
    m = None
    for j in range(chunk):
        b = {"images": preprocess(images_u8[j].astype(jnp.float32), "tf"),
             "labels": labels[j]}
        state, m = step(state, b)
    return state, m
r = np.random.default_rng(0)
for i in range(2600 // chunk):
    idx = r.integers(0, len(tr_imgs), (chunk, 64))
    state, m = multi(state, jnp.asarray(tr_imgs[idx]), jnp.asarray(tr_labels[idx].astype(np.int32)))
print(f"trained: loss {float(m['loss']):.3f} acc {float(m['accuracy']):.3f}", flush=True)

params = {k: v for k, v in state.params.items() if k != "classifier"}
def gap(bs):
    v = {"params": params, "batch_stats": bs}
    x = preprocess(jnp.asarray(ev_imgs).astype(jnp.float32), "tf")
    e = np.asarray(model.apply(v, x, train=False), np.float64)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    cos = e @ e.T
    n = len(ev_labels)
    same = (ev_labels[:, None] == ev_labels[None, :]) & ~np.eye(n, dtype=bool)
    return float(cos[same].mean() - cos[ev_labels[:, None] != ev_labels[None, :]].mean())
print(f"gap before recalibration: {gap(state.batch_stats):.5f}", flush=True)

# recalibrate: fresh EMA of batch statistics over clean training batches
@jax.jit
def recal_step(bs, images_u8):
    x = preprocess(images_u8.astype(jnp.float32), "tf")
    _, mut = model.apply({"params": params, "batch_stats": bs}, x,
                         train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.key(0)})
    return mut["batch_stats"]
bs = state.batch_stats
for i in range(600):
    idx = r.integers(0, len(tr_imgs), 64)
    bs = recal_step(bs, jnp.asarray(tr_imgs[idx]))
    if (i + 1) % 100 == 0:
        print(f"gap after {i+1}-batch recalibration: {gap(bs):.5f}", flush=True)
import flax
old = flax.traverse_util.flatten_dict(state.batch_stats)
new = flax.traverse_util.flatten_dict(bs)
import numpy as _np
for k in list(old)[:6]:
    o, n2 = _np.asarray(old[k]), _np.asarray(new[k])
    print("/".join(k), "old-absmean", float(_np.abs(o).mean()), "new-absmean", float(_np.abs(n2).mean()), flush=True)
