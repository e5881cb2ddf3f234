import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from deep_insight_face_tpu.ops.align import warp_affine, warp_affine_mxu

rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 3)).astype(np.float32))
ths = [0.0, 0.1, -0.25, 0.2]
mats = []
for i, th in enumerate(ths):
    s = 0.9 + 0.1 * i / 3
    c, sn = np.cos(th) * s, np.sin(th) * s
    mats.append([[c, -sn, 5.0 - i], [sn, c, 3.0 + i]])
mats = jnp.asarray(np.array(mats, np.float32))
ref = np.asarray(warp_affine(imgs, mats, (48, 48)))
new = np.asarray(warp_affine_mxu(imgs, mats, (48, 48)))
diff = np.abs(ref - new)
# interior only (border semantics may differ by a pixel)
inner = diff[:, 2:-2, 2:-2]
print("max interior diff:", inner.max(), "mean:", inner.mean())
print("max overall diff:", diff.max())
# pure scale-translate must match closely everywhere
m2 = jnp.asarray(np.tile(np.array([[[0.8, 0, 4.0], [0, 0.8, 2.0]]], np.float32), (4, 1, 1)))
r2 = np.asarray(warp_affine(imgs, m2, (48, 48)))
n2 = np.asarray(warp_affine_mxu(imgs, m2, (48, 48)))
print("scale-translate max diff:", np.abs(r2 - n2).max())
