"""End-to-end regression gate on SHIPPED trained weights.

The CI-grade version of scripts/e2e_quality.py: raw cluttered scenes of
known held-out identities → full fused pipeline (detect → Pallas NMS →
LandmarkNet → similarity align → embed) with the weights the repo ships
→ ratcheted thresholds on detection rate, verification accuracy and AUC
(VERDICT r2 #2: a gate that actually catches a quality collapse, not a
cos-gap smoke check). Thresholds sit just below the measured shipped
quality (e2e_quality.json) — ratchet them upward when it improves.
Skips when shipped weights are absent (fresh clone without LFS etc.).
"""

import numpy as np
import pytest

from deep_insight_face_tpu.utils import pretrained

# ratchet: current shipped quality minus epsilon (see e2e_quality.json:
# r4 tiny_mx serving default measures detection 1.0, accuracy 1.0,
# AUC 1.0 on 360 scenes). Raise these when the shipped weights improve;
# never lower. Gate-scale (60 scenes) noise keeps the floors below the
# measured values.
# Detection gate: found is gated at DetectorConfig.decision_threshold
# (0.1, the measured operating point — faceless frames score ≤ 5e-5)
# while crops come from the candidate floor. p≈0.983 over 60 gate
# scenes: the 0.93 gate fails on ≥5/60 misses, P≈0.004 binomial noise.
# TAR gate (VERDICT r3 #3): the metric-of-record family (reference
# protocol evaluation/utility.py:26 uses FAR=1e-3, which 1,000 gate
# impostor pairs cannot resolve — ~1 accept; FAR=1e-2 resolves at ~10
# accepts/fold-train). Measured shipped TAR@FAR=1e-2 at gate scale is
# 1.000; the 0.95 floor catches a verification-quality collapse while
# absorbing per-fold interpolation noise.
MIN_DETECTION_RATE = 0.93
MIN_ACCURACY = 0.98
MIN_AUC = 0.99
MIN_TAR_AT_FAR_1E2 = 0.95


def _has_all_weights(detector="tiny_mx"):
    return all(
        pretrained.weights_path(n) is not None
        for n in (f"detector_{detector}.npz", "landmark_68.npz",
                  "embedder_synth_resnet50v2.npz")
    )


# both shipped detector variants are gated: tiny_mx is the serving
# default (config.DetectorConfig.variant), tiny_s2d the 416/320
# alternative users can still select
@pytest.mark.slow
@pytest.mark.parametrize("detector_variant", ["tiny_mx", "tiny_s2d"])
def test_shipped_pipeline_quality_gate(detector_variant):
    import dataclasses

    if not _has_all_weights(detector_variant):
        pytest.skip("shipped weights absent")

    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.data.synthetic import identity_scenes

    cfg = default_config()
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, variant=detector_variant))
    fr = FaceRecognition(cfg)

    # ≥20 held-out identities (disjoint from every training seed space:
    # train 0.., crop-eval 10M.., e2e-script 20M.., this gate 30M..)
    n_ids, per_id = 20, 3
    imgs, labels = identity_scenes(n_ids, per_id, size=416, seed=3,
                                   id_offset=30_000_000)
    from deep_insight_face_tpu.utils.batching import batched_apply

    emb, _, found = batched_apply(fr.face_encodings_batch, imgs, 12)

    det_rate = float(found.mean())
    assert det_rate >= MIN_DETECTION_RATE, (
        f"detection rate {det_rate:.3f} < {MIN_DETECTION_RATE} — "
        f"shipped detector/landmark quality collapsed"
    )

    # LFW-protocol verification over the pipeline embeddings: all same
    # pairs + 5 impostor pairs per id (shared builder shuffles pair
    # order so the contiguous k-folds stay two-class)
    from deep_insight_face_tpu.evaluation.verification import (
        evaluate_pairs, verification_pairs,
    )

    # 50 impostors/id × 20 ids = 1,000 impostor pairs — enough to
    # resolve the FAR=1e-2 operating point the TAR gate reads
    e1, e2, issame = verification_pairs(
        labels, np.random.default_rng(5), impostors_per_id=50,
    )
    report = evaluate_pairs(
        emb, e1, e2, issame,
        nrof_folds=10, distance_metric=0, subtract_mean=True,
        far_target=1e-2,
    )
    acc = float(np.mean(report.accuracy))
    auc = float(report.auc)
    assert acc >= MIN_ACCURACY, (
        f"e2e verification accuracy {acc:.3f} < {MIN_ACCURACY} — "
        f"shipped pipeline quality collapsed (AUC {auc:.3f}, "
        f"EER {float(report.eer):.3f})"
    )
    assert auc >= MIN_AUC, f"e2e AUC {auc:.3f} < {MIN_AUC}"
    tar = float(report.val)
    assert tar >= MIN_TAR_AT_FAR_1E2, (
        f"e2e TAR@FAR=1e-2 {tar:.3f} < {MIN_TAR_AT_FAR_1E2} "
        f"(achieved FAR {float(report.far):.4f}) — metric-of-record "
        f"verification quality collapsed"
    )


@pytest.mark.slow
@pytest.mark.skipif(not _has_all_weights(), reason="shipped weights absent")
def test_per_image_api_matches_batch_pipeline():
    """Cross-path consistency: `face_encodings` (per-image detect →
    landmark → Umeyama align → embed) must produce embeddings compatible
    with `face_encodings_batch` (the fused serving pipeline) on the SAME
    frame — a gallery enrolled through one path must be identifiable
    through the other. Regression for the 3-point-OpenFace-vs-Umeyama
    alignment split (same-identity cross-path cosine was 0.17)."""
    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.data.synthetic import identity_scenes

    fr = FaceRecognition()
    imgs, _ = identity_scenes(2, 1, size=416, seed=11,
                              id_offset=31_000_000)
    batch_emb, _, found = fr.face_encodings_batch(imgs)
    assert found.all()
    for i, img in enumerate(imgs):
        per_image = fr.face_encodings(img)
        assert per_image, f"per-image path found no face in frame {i}"
        cos = float(per_image[0] @ batch_emb[i])
        assert cos >= 0.8, (
            f"frame {i}: per-image vs batch embedding cosine {cos:.3f} — "
            f"the two alignment paths have diverged"
        )
