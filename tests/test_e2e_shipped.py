"""End-to-end regression on SHIPPED trained weights.

The CI-grade version of scripts/e2e_quality.py: raw cluttered scenes of
known held-out identities → full fused pipeline (detect → Pallas NMS →
LandmarkNet → similarity align → embed) with the weights the repo ships
→ assert the system actually detects faces and separates identities.
Skips when shipped weights are absent (fresh clone without LFS etc.).
"""

import numpy as np
import pytest

from deep_insight_face_tpu.utils import pretrained


def _has_all_weights():
    return all(
        pretrained.weights_path(n) is not None
        for n in ("detector_tiny_s2d.npz", "landmark_68.npz",
                  "embedder_synth_resnet50v2.npz")
    )


@pytest.mark.slow
@pytest.mark.skipif(not _has_all_weights(), reason="shipped weights absent")
def test_shipped_pipeline_separates_identities():
    import dataclasses

    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.data.synthetic import identity_scenes

    cfg = default_config()
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, variant="tiny_s2d"))
    fr = FaceRecognition(cfg)

    # 6 held-out identities (disjoint from every training seed space),
    # 2 scenes each, batch = all 12 at once
    imgs, labels = identity_scenes(6, 2, size=416, seed=3,
                                   id_offset=30_000_000)
    emb, boxes, found = fr.face_encodings_batch(imgs)

    assert found.mean() >= 0.75, f"detection rate {found.mean()}"

    en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    cos = en @ en.T
    n = len(labels)
    same = (labels[:, None] == labels[None, :]) & ~np.eye(n, dtype=bool)
    diff = labels[:, None] != labels[None, :]
    # only score pairs where both faces were found
    ok = found[:, None] & found[None, :]
    gap = cos[same & ok].mean() - cos[diff & ok].mean()
    assert gap > 0.3, f"identity cos gap {gap}"
    # and the gap must be usable: every found same-pair closer than the
    # mean diff-pair
    assert cos[same & ok].min() > cos[diff & ok].mean()
