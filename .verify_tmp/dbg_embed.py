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
imgs, labels = identity_dataset(4, 3, size=112, seed=1, id_offset=10_000_000)
x = preprocess(jnp.asarray(imgs).astype(jnp.float32), "tf")
e = np.asarray(model.apply(v, x, train=False))
print("eval-mode nan:", np.isnan(e).any(), "std over batch:", float(e.std(0).mean()))
print("cos same:", float(e[0] @ e[1]), float(e[3] @ e[4]))
print("cos diff:", float(e[0] @ e[3]), float(e[0] @ e[6]))
bs = v.get("batch_stats", {})
leaves = jax.tree.leaves(bs)
print("batch_stats leaves:", len(leaves),
      "mean abs:", float(np.mean([float(np.abs(l).mean()) for l in leaves])) if leaves else None)
# train ids for comparison (seen during training)
imgs2, _ = identity_dataset(4, 3, size=112, seed=0)
x2 = preprocess(jnp.asarray(imgs2).astype(jnp.float32), "tf")
e2 = np.asarray(model.apply(v, x2, train=False))
print("TRAIN-id cos same:", float(e2[0] @ e2[1]), "diff:", float(e2[0] @ e2[3]))
