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

# hard-protocol ratchets (VERDICT r4 #3: the standard gate saturated at
# 1.000 and can no longer discriminate — the hard protocol can). Gate
# scale (60 scenes: min_face 0.15-0.35, rotation ±0.5 rad, 50%% face
# occlusion — the scripts/e2e_quality.py --hard distribution) measured
# with the r4 shipped weights: detection 0.933, accuracy 0.971,
# TAR@FAR=1e-2 0.574. Floors sit measured-minus-margin; RAISE them when
# hard-trained weights ship, never lower.
HARD_MIN_DETECTION_RATE = 0.85
HARD_MIN_ACCURACY = 0.92
HARD_MIN_TAR_AT_FAR_1E2 = 0.45

# serving-tier ratchets (VERDICT r4 #1: the advertised 18.4k faces/s
# tier — tiny_mx@320 + MobileNetV2-GN — measured e2e TAR@FAR=1e-3 0.32
# with the r4 aligned-world weights; the r5 pipeline-world distilled
# student measures detection 1.000, accuracy 0.993, AUC 0.9997,
# TAR@1e-3 0.966 at full eval scale, e2e_quality sidecar
# weights/embedder_synth_mobilenetv2_gn.json). Floors at gate scale
# sit measured-minus-margin; RAISE on improvement, never lower.
TIER_MIN_DETECTION_RATE = 0.93
TIER_MIN_ACCURACY = 0.96
TIER_MIN_AUC = 0.98
TIER_MIN_TAR_AT_FAR_1E2 = 0.90


def _has_all_weights(detector="tiny_mx",
                     embedder="embedder_synth_resnet50v2.npz"):
    return all(
        pretrained.weights_path(n) is not None
        for n in (f"detector_{detector}.npz", "landmark_68.npz", embedder)
    )


def _run_gate(detector_variant, hard=False, tier=False):
    """Shared gate body: render held-out scenes, run the full fused
    pipeline with shipped weights, return (det_rate, acc, auc, tar,
    report). ``hard`` switches to the discriminating stress protocol;
    ``tier`` switches to the serving-tier config (320 frames, 320
    detector input, MobileNetV2-GN embedder)."""
    import dataclasses

    from deep_insight_face_tpu.api import FaceRecognition
    from deep_insight_face_tpu.config import default_config
    from deep_insight_face_tpu.data.synthetic import identity_scenes
    from deep_insight_face_tpu.evaluation.verification import (
        evaluate_pairs, verification_pairs,
    )
    from deep_insight_face_tpu.utils.batching import batched_apply

    cfg = default_config()
    det_kw = dict(variant=detector_variant)
    size = 416
    if tier:
        det_kw["input_size"] = size = 320
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, backbone="mobilenetv2", norm="group"))
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, **det_kw))
    fr = FaceRecognition(cfg)

    # ≥20 held-out identities (disjoint from every training seed space:
    # train 0.., crop-eval 10M.., e2e-script 20M.., this gate 30M..)
    n_ids, per_id = 20, 3
    hard_kw = (dict(min_face=0.15, max_face=0.35, rotation_range=0.5,
                    occlude=0.5) if hard else {})
    imgs, labels = identity_scenes(n_ids, per_id, size=size, seed=3,
                                   id_offset=30_000_000, **hard_kw)
    emb, _, found = batched_apply(fr.face_encodings_batch, imgs, 12)

    # LFW-protocol verification over the pipeline embeddings: all same
    # pairs + 50 impostor pairs per id = 1,000 impostors — enough to
    # resolve the FAR=1e-2 operating point the TAR gate reads (shared
    # builder shuffles pair order so the contiguous k-folds stay
    # two-class)
    e1, e2, issame = verification_pairs(
        labels, np.random.default_rng(5), impostors_per_id=50,
    )
    report = evaluate_pairs(
        emb, e1, e2, issame,
        nrof_folds=10, distance_metric=0, subtract_mean=True,
        far_target=1e-2,
    )
    return (float(found.mean()), float(np.mean(report.accuracy)),
            float(report.auc), float(report.val), report)


# both shipped detector variants are gated: tiny_mx is the serving
# default (config.DetectorConfig.variant), tiny_s2d the 416/320
# alternative users can still select
@pytest.mark.slow
@pytest.mark.parametrize("detector_variant", ["tiny_mx", "tiny_s2d"])
def test_shipped_pipeline_quality_gate(detector_variant):
    if not _has_all_weights(detector_variant):
        pytest.skip("shipped weights absent")

    det_rate, acc, auc, tar, report = _run_gate(detector_variant)
    assert det_rate >= MIN_DETECTION_RATE, (
        f"detection rate {det_rate:.3f} < {MIN_DETECTION_RATE} — "
        f"shipped detector/landmark quality collapsed"
    )
    assert acc >= MIN_ACCURACY, (
        f"e2e verification accuracy {acc:.3f} < {MIN_ACCURACY} — "
        f"shipped pipeline quality collapsed (AUC {auc:.3f}, "
        f"EER {float(report.eer):.3f})"
    )
    assert auc >= MIN_AUC, f"e2e AUC {auc:.3f} < {MIN_AUC}"
    assert tar >= MIN_TAR_AT_FAR_1E2, (
        f"e2e TAR@FAR=1e-2 {tar:.3f} < {MIN_TAR_AT_FAR_1E2} "
        f"(achieved FAR {float(report.far):.4f}) — metric-of-record "
        f"verification quality collapsed"
    )


@pytest.mark.slow
def test_shipped_pipeline_hard_protocol_gate():
    """The discriminating regression gate: small (0.15-0.35 frame
    fraction), ±0.5 rad rotated, 50%-occluded faces — the distribution
    where shipped quality is NOT saturated, so a regression actually
    moves the numbers (VERDICT r4 #3). Serving-default detector only."""
    if not _has_all_weights("tiny_mx"):
        pytest.skip("shipped weights absent")

    det_rate, acc, auc, tar, report = _run_gate("tiny_mx", hard=True)
    assert det_rate >= HARD_MIN_DETECTION_RATE, (
        f"hard detection rate {det_rate:.3f} < {HARD_MIN_DETECTION_RATE} "
        f"— small/occluded-face detection regressed"
    )
    assert acc >= HARD_MIN_ACCURACY, (
        f"hard e2e accuracy {acc:.3f} < {HARD_MIN_ACCURACY} "
        f"(AUC {auc:.3f}, EER {float(report.eer):.3f})"
    )
    assert tar >= HARD_MIN_TAR_AT_FAR_1E2, (
        f"hard e2e TAR@FAR=1e-2 {tar:.3f} < {HARD_MIN_TAR_AT_FAR_1E2} "
        f"(achieved FAR {float(report.far):.4f})"
    )


@pytest.mark.slow
def test_shipped_serving_tier_gate():
    """The deployed 320 serving tier (tiny_mx@320 + MobileNetV2-GN) is
    gated END-TO-END, not just crop-level — the r4 tier shipped at
    crop accuracy 0.990 while its e2e TAR@1e-3 was 0.32 (STATUS r4),
    exactly the gap a crop-only gate cannot see."""
    if not (_has_all_weights("tiny_mx_320",
                             "embedder_synth_mobilenetv2_gn.npz")
            or _has_all_weights("tiny_mx",
                                "embedder_synth_mobilenetv2_gn.npz")):
        pytest.skip("shipped tier weights absent")

    det_rate, acc, auc, tar, report = _run_gate("tiny_mx", tier=True)
    assert det_rate >= TIER_MIN_DETECTION_RATE, (
        f"tier detection rate {det_rate:.3f} < {TIER_MIN_DETECTION_RATE}"
    )
    assert acc >= TIER_MIN_ACCURACY, (
        f"tier e2e accuracy {acc:.3f} < {TIER_MIN_ACCURACY} "
        f"(AUC {auc:.3f}, EER {float(report.eer):.3f})"
    )
    assert auc >= TIER_MIN_AUC, f"tier e2e AUC {auc:.3f} < {TIER_MIN_AUC}"
    assert tar >= TIER_MIN_TAR_AT_FAR_1E2, (
        f"tier e2e TAR@FAR=1e-2 {tar:.3f} < {TIER_MIN_TAR_AT_FAR_1E2} "
        f"(achieved FAR {float(report.far):.4f}) — the tier embedder "
        f"regressed to crop-only robustness"
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
