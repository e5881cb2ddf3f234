import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.config import ModelConfig
from deep_insight_face_tpu.models import build_embedding_model
from deep_insight_face_tpu.utils.weights import load_npz
from deep_insight_face_tpu.data.synthetic import identity_dataset
from deep_insight_face_tpu.ops.image import preprocess

v = load_npz('/root/repo/deep_insight_face_tpu/weights/embedder_synth_resnet50v2.npz')
cfg = ModelConfig(backbone="resnet50v2", head="gdc", embedding_size=128, image_size=112)
model = build_embedding_model(cfg)
imgs, labels = identity_dataset(4, 4, size=112, seed=0)  # TRAIN ids
x = preprocess(jnp.asarray(imgs).astype(jnp.float32), "tf")
# batch-stats (train) mode, no dropout randomness effect check
e_tr, _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.key(0)})
e_tr = np.asarray(e_tr)
same = [float(e_tr[i] @ e_tr[i+1]) for i in (0, 4, 8)]
diff = [float(e_tr[0] @ e_tr[4]), float(e_tr[0] @ e_tr[8]), float(e_tr[4] @ e_tr[12])]
print("train-mode cos same:", same)
print("train-mode cos diff:", diff)
# how different are running stats from this batch's stats?
import flax
flat = flax.traverse_util.flatten_dict(v["batch_stats"])
for k in list(flat)[:4]:
    print("/".join(k), "mean-abs", float(np.abs(flat[k]).mean()),
          "max-abs", float(np.abs(flat[k]).max()))
maxv = max(float(np.abs(a).max()) for a in flat.values())
print("global max |batch_stats| =", maxv)

e = np.asarray(model.apply(v, x, train=False))
print("eval norms:", np.linalg.norm(e, axis=1)[:6])
en = e / np.linalg.norm(e, axis=1, keepdims=True)
print("TRUE cos same:", float(en[0] @ en[1]), float(en[4] @ en[5]))
print("TRUE cos diff:", float(en[0] @ en[4]), float(en[0] @ en[8]), float(en[4] @ en[12]))
