#!/bin/bash
# Waits for the tier-distill queue to free the TPU, then:
#  1. retrains LandmarkNet with a 50% hard-stress fraction (pose +-0.5,
#     occluders, amodal labels) warm-started from the shipped weights
#  2. evaluates hard + standard e2e with the new landmarks x {hardft2
#     candidate embedder, shipped embedder} to attribute the gain
#  3. trains the full Darknet-53 3-scale variant on the merged hard
#     scene cache (VERDICT #5 proof)
cd /root/repo
while [ ! -f .r5/tier_queue.done ]; do sleep 20; done

python scripts/train_landmark_weights.py --steps 6000 --train-n 6000 \
  --eval-n 512 --batch 64 --hard-frac 0.5 \
  --init-from deep_insight_face_tpu/weights/landmark_68.npz \
  --output .r5/landmark_68_hard.npz > .r5/lm_train.log 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "train failed rc=$rc" >> .r5/lm_train.log; touch .r5/lm_queue.done; exit 1; fi

python scripts/e2e_quality.py --hard \
  --landmark-weights .r5/landmark_68_hard.npz \
  --embedder-weights .r5/embedder_resnet_hardft2.npz \
  --output .r5/e2e_hard_lmh_e2.json > .r5/e2e_hard_lmh_e2.log 2>&1
python scripts/e2e_quality.py --hard \
  --landmark-weights .r5/landmark_68_hard.npz \
  --output .r5/e2e_hard_lmh_shipped.json > .r5/e2e_hard_lmh_shipped.log 2>&1
python scripts/e2e_quality.py \
  --landmark-weights .r5/landmark_68_hard.npz \
  --embedder-weights .r5/embedder_resnet_hardft2.npz \
  --output .r5/e2e_std_lmh_e2.json > .r5/e2e_std_lmh_e2.log 2>&1
python scripts/e2e_quality.py \
  --landmark-weights .r5/landmark_68_hard.npz \
  --output .r5/e2e_std_lmh_shipped.json > .r5/e2e_std_lmh_shipped.log 2>&1
touch .r5/lm_queue.done

python scripts/train_detector_weights.py --variant full --steps 3000 \
  --train-n 2496 --eval-n 96 --batch 16 --input-size 416 \
  --faceless-frac 0.2 --rotation-range 0.5 --occlude 0.4 \
  --scene-cache .r5/scenes_hard_merged_shuf_416.npz \
  --output .r5/detector_full_hard.npz > .r5/full_train.log 2>&1
echo "rc=$?" >> .r5/full_train.log
touch .r5/full_queue.done
