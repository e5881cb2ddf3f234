import sys; sys.path.insert(0, "/root/repo")
import numpy as np
from deep_insight_face_tpu.evaluation.verification import evaluate

rng = np.random.default_rng(0)
D = 64
# moderately separable: same-pairs closer than diff-pairs with noise
def unit(v): return v / np.linalg.norm(v, axis=-1, keepdims=True)
centers = unit(rng.normal(size=(20, D)))
e1, e2, issame = [], [], []
for i in range(20):
    for _ in range(5):
        a = unit(centers[i] + 0.6 * rng.normal(size=D))
        b = unit(centers[i] + 0.6 * rng.normal(size=D))
        e1.append(a); e2.append(b); issame.append(True)
        j = (i + 1 + int(rng.integers(0, 18))) % 20
        c = unit(centers[j] + 0.6 * rng.normal(size=D))
        e1.append(unit(centers[i] + 0.6 * rng.normal(size=D)))
        e2.append(c); issame.append(False)
inter = np.empty((2 * len(e1), D))
inter[0::2] = np.array(e1); inter[1::2] = np.array(e2)
r = evaluate(inter, np.array(issame), nrof_folds=2, distance_metric=0, subtract_mean=False)
print("separable:", r.summary())
# nearly-collapsed: tiny signal
base = unit(rng.normal(size=D))
e1b = [unit(base + 0.001 * centers[i % 20] + 0.0005 * rng.normal(size=D)) for i in range(200)]
e2b = [unit(base + 0.001 * centers[i % 20] + 0.0005 * rng.normal(size=D)) if s else
       unit(base + 0.001 * centers[(i+3) % 20] + 0.0005 * rng.normal(size=D))
       for i, s in enumerate(issame)]
inter2 = np.empty((2 * len(e1b), D))
inter2[0::2] = np.array(e1b); inter2[1::2] = np.array(e2b)
r2 = evaluate(inter2, np.array(issame), nrof_folds=2, distance_metric=0, subtract_mean=False)
print("collapsed:", r2.summary())
