import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.data.synthetic import identity_dataset
from deep_insight_face_tpu.ops.image import augment_batch, preprocess

imgs, labels = identity_dataset(8, 4, size=64, seed=0)
x = jnp.asarray(imgs).astype(jnp.float32)
for opt in ("none", "geometric", "non_geometric"):
    out = x if opt == "none" else augment_batch(jax.random.key(3), x, opt)
    p = np.asarray(preprocess(out, "tf"))
    print(f"{opt:14s} min {p.min():8.3f} max {p.max():8.3f} mean {p.mean():8.4f} "
          f"nan {np.isnan(p).any()}")
