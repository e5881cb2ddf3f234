import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp, time
from deep_insight_face_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from deep_insight_face_tpu.data.synthetic import identity_dataset
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.ops.image import preprocess
from deep_insight_face_tpu.parallel.train_step import create_train_state, make_train_step

STEPS = 4000
cfg = Config(
    model=ModelConfig(backbone="resnet50v2", head="gdc", embedding_size=128,
                      image_size=112, width_multiplier=1.0),
    data=DataConfig(batch_size=64, augmentation="none"),
    train=TrainConfig(mode="arcface", num_classes=400, learning_rate=1e-3,
                      warmup_steps=200),
)
tr_imgs, tr_labels = identity_dataset(400, 16, size=112, seed=0)
ev_imgs, ev_labels = identity_dataset(16, 4, size=112, seed=1, id_offset=10_000_000)
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

xev = preprocess(jnp.asarray(ev_imgs).astype(jnp.float32), "tf")
xtr = preprocess(jnp.asarray(tr_imgs[:64]).astype(jnp.float32), "tf")
ltr = tr_labels[:64]
@jax.jit
def embed_eval(variables, x):
    return model.apply(variables, x, train=False)

def gap(e, labels):
    e = np.asarray(e, np.float64); e /= np.linalg.norm(e, axis=1, keepdims=True)
    cos = e @ e.T
    n = len(labels)
    same = np.array([[labels[i]==labels[j] and i!=j for j in range(n)] for i in range(n)])
    diff = np.array([[labels[i]!=labels[j] for j in range(n)] for i in range(n)])
    return float(cos[same].mean() - cos[diff].mean())

r = np.random.default_rng(0)
t0=time.time()
for i in range(STEPS // chunk):
    idx = r.integers(0, len(tr_imgs), (chunk, 64))
    state, m = multi(state, jnp.asarray(tr_imgs[idx]), jnp.asarray(tr_labels[idx].astype(np.int32)))
    done = (i+1)*chunk
    if done % 500 == 0:
        variables = {"params": {k: v for k, v in state.params.items() if k != "classifier"},
                     "batch_stats": state.batch_stats}
        gev = gap(embed_eval(variables, xev), ev_labels)
        gtr = gap(embed_eval(variables, xtr), ltr)
        print(f"step {done} loss {float(m['loss']):.3f} acc {float(m['accuracy']):.3f} "
              f"evalmode-gap held-out {gev:.5f} train-ids {gtr:.5f} "
              f"({(time.time()-t0)/done*1000:.0f} ms/step)", flush=True)
