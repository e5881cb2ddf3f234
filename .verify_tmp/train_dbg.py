import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from deep_insight_face_tpu.data.synthetic import identity_dataset
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.ops.image import augment_batch, preprocess
from deep_insight_face_tpu.parallel.train_step import create_train_state, make_train_step

STEPS = 2000
cfg = Config(
    model=ModelConfig(backbone="resnet50v2", head="gdc", embedding_size=128,
                      image_size=112, width_multiplier=1.0),
    data=DataConfig(batch_size=64, augmentation="none"),
    train=TrainConfig(mode="arcface", num_classes=400, learning_rate=1e-3,
                      warmup_steps=200),
)
tr_imgs, tr_labels = identity_dataset(400, 8, size=112, seed=0)
ev_imgs, ev_labels = identity_dataset(16, 4, size=112, seed=1, id_offset=10_000_000)
model = build_embedding_model(cfg.model)
state = create_train_state(model, cfg, jax.random.key(0))
step = make_train_step(cfg)
chunk = 8
@jax.jit
def multi(state, images_u8, labels):
    m = None
    for j in range(chunk):
        b = {"images": preprocess(images_u8[j].astype(jnp.float32), cfg.data.preprocess_mode),
             "labels": labels[j]}
        state, m = step(state, b)
    return state, m
r = np.random.default_rng(0)
import time; t0=time.time()
for i in range(STEPS // chunk):
    idx = r.integers(0, len(tr_imgs), (chunk, 64))
    state, m = multi(state, jnp.asarray(tr_imgs[idx]), jnp.asarray(tr_labels[idx].astype(np.int32)))
    if (i+1) % 50 == 0:
        print(f"step {(i+1)*chunk} loss {float(m['loss']):.3f} acc {float(m['accuracy']):.3f} ({(time.time()-t0)/(i+1)/chunk*1000:.0f} ms/step)", flush=True)

variables = {"params": {k: v for k, v in state.params.items() if k != "classifier"},
             "batch_stats": state.batch_stats}
x = preprocess(jnp.asarray(ev_imgs).astype(jnp.float32), "tf")
def stats(e, tag):
    e = np.asarray(e); e = e / np.linalg.norm(e, axis=1, keepdims=True)
    cos = e @ e.T
    same = np.mean([cos[i, j] for i in range(64) for j in range(64) if i != j and ev_labels[i] == ev_labels[j]])
    diff = np.mean([cos[i, j] for i in range(64) for j in range(64) if ev_labels[i] != ev_labels[j]])
    print(f"{tag}: mean cos same {same:.6f} diff {diff:.6f} gap {same-diff:.6f}", flush=True)
e_ev = model.apply(variables, x, train=False)
stats(e_ev, "eval-mode (running stats)")
e_tr, _ = model.apply(variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)})
stats(e_tr, "train-mode (batch stats) ")
# also TRAIN-id sanity in both modes
x2 = preprocess(jnp.asarray(tr_imgs[:64]).astype(jnp.float32), "tf")
l2 = tr_labels[:64]
def stats2(e, tag):
    e = np.asarray(e); e = e / np.linalg.norm(e, axis=1, keepdims=True)
    cos = e @ e.T
    same = np.mean([cos[i, j] for i in range(64) for j in range(64) if i != j and l2[i] == l2[j]])
    diff = np.mean([cos[i, j] for i in range(64) for j in range(64) if l2[i] != l2[j]])
    print(f"{tag}: mean cos same {same:.6f} diff {diff:.6f} gap {same-diff:.6f}", flush=True)
stats2(model.apply(variables, x2, train=False), "TRAIN ids eval-mode")
e2, _ = model.apply(variables, x2, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)})
stats2(e2, "TRAIN ids train-mode")
