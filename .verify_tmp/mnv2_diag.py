import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from deep_insight_face_tpu.data.synthetic import aligned_identity_dataset
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.ops.image import preprocess
from deep_insight_face_tpu.parallel.train_step import create_train_state, make_train_step

STEPS = 1600
cfg = Config(
    model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=128,
                      image_size=112, width_multiplier=1.0),
    data=DataConfig(batch_size=64, augmentation="none"),
    train=TrainConfig(mode="arcface", num_classes=400, learning_rate=1e-3,
                      warmup_steps=200),
)
tr_imgs, tr_labels = aligned_identity_dataset(400, 8, size=112, seed=0)
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
for i in range(STEPS // chunk):
    idx = r.integers(0, len(tr_imgs), (chunk, 64))
    state, m = multi(state, jnp.asarray(tr_imgs[idx]), jnp.asarray(tr_labels[idx].astype(np.int32)))
    if (i+1) % 50 == 0:
        print(f"step {(i+1)*chunk} loss {float(m['loss']):.3f} acc {float(m['accuracy']):.3f}", flush=True)

variables = {"params": {k: v for k, v in state.params.items() if k != "classifier"},
             "batch_stats": state.batch_stats}
x = preprocess(jnp.asarray(tr_imgs[:64]).astype(jnp.float32), "tf")
out, mods = model.apply(variables, x, train=False, capture_intermediates=True)
flat = {}
def walk(d, pfx):
    for k, v in d.items():
        if isinstance(v, dict):
            walk(v, pfx + "/" + k)
        else:
            flat[pfx + "/" + k] = v
walk(mods["intermediates"], "")
print(f"{len(flat)} intermediates", flush=True)
rows = []
for k, v in flat.items():
    a = np.asarray(v[0] if isinstance(v, tuple) else v, np.float32)
    if a.ndim < 2: continue
    batch_std = a.std(axis=0).mean()        # variation ACROSS inputs
    total_std = a.std()
    rows.append((k, float(batch_std), float(total_std)))
for k, bs, ts in rows:
    flag = "  <-- DEAD" if bs < 1e-3 * max(ts, 1e-9) or bs < 1e-6 else ""
    print(f"{k[:70]:70s} batchstd {bs:10.5f} totalstd {ts:10.5f}{flag}", flush=True)
