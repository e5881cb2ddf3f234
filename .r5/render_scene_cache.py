import sys, numpy as np, os, time
sys.path.insert(0, "/root/repo")
from deep_insight_face_tpu.data.synthetic import detection_scenes
t0 = time.time()
imgs, boxes, valid = detection_scenes(
    1296, size=416, max_faces=3, seed=0, workers=8,
    faceless_frac=0.2, rotation_range=0.5, occlude=0.4)
np.savez_compressed("/root/repo/.r5/scenes_hard_noise_416.npz",
                    imgs=imgs, boxes=boxes, valid=valid)
print(f"done {time.time()-t0:.0f}s, {valid.sum()} faces")
