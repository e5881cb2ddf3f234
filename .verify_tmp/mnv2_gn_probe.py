import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from deep_insight_face_tpu.data.synthetic import aligned_identity_dataset
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.ops.image import preprocess
from deep_insight_face_tpu.ops.losses import arcface_logits
from deep_insight_face_tpu.parallel.train_step import create_train_state, make_train_step

cfg = Config(
    model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=128,
                      image_size=112, width_multiplier=1.0, norm="group"),
    data=DataConfig(batch_size=64, augmentation="none"),
    train=TrainConfig(mode="arcface", num_classes=400, learning_rate=1e-3,
                      warmup_steps=200),
)
tr_imgs, tr_labels = aligned_identity_dataset(400, 16, size=112, seed=0)
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
    if (i + 1) % 100 == 0:
        print(f"step {(i+1)*chunk} loss {float(m['loss']):.3f} acc {float(m['accuracy']):.3f}", flush=True)

params = {k: v for k, v in state.params.items() if k != "classifier"}
kernel = state.params["classifier"]["kernel"]
variables = {"params": params, "batch_stats": state.batch_stats}
x = preprocess(jnp.asarray(tr_imgs[:64]).astype(jnp.float32), "tf")
lbl = jnp.asarray(tr_labels[:64].astype(np.int32))

def report(tag, e):
    e = np.asarray(e, np.float64)
    print(f"{tag}: nan={np.isnan(e).any()} norm={np.linalg.norm(e,axis=1).mean():.4f}", flush=True)
    en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    cos = en @ en.T
    n = len(lbl)
    l = np.asarray(lbl)
    same = (l[:, None] == l[None, :]) & ~np.eye(n, dtype=bool)
    gap = cos[same].mean() - cos[l[:, None] != l[None, :]].mean()
    logits = np.asarray(arcface_logits(jnp.asarray(e, jnp.float32), kernel, lbl))
    acc = (logits.argmax(1) == l).mean()
    # also plain (margin-free) cosine classification accuracy
    kn = np.asarray(kernel); kn = kn / np.linalg.norm(kn, axis=0, keepdims=True)
    plain = (en @ kn).argmax(1)
    print(f"{tag}: cos-gap {gap:.6f}  offline-arcface-acc {acc:.3f} plain-acc {(plain==l).mean():.3f}", flush=True)

e_eval = model.apply(variables, x, train=False)
report("eval (no dropout)      ", e_eval)
for s in (1, 2):
    e_tr, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(s)})
    report(f"train-mode dropout rng{s}", e_tr)
# classifier kernel geometry
kn = np.asarray(kernel); kn = kn / np.linalg.norm(kn, axis=0, keepdims=True)
kc = kn.T @ kn
print(f"classifier W cos: mean {kc[~np.eye(400,dtype=bool)].mean():.4f} max {kc[~np.eye(400,dtype=bool)].max():.4f}", flush=True)
