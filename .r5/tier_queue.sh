#!/bin/bash
# Waits for the E2 flagship queue (TPU) and the tier harvest (CPU), then
# trains the serving-tier student with teacher distillation and evaluates
# it through the real 320 tier.
cd /root/repo
while [ ! -f .r5/e2_queue.done ] || [ ! -f .r5/tier_harvest.done ]; do sleep 20; done
python scripts/train_embedder_weights.py --backbone mobilenetv2 --width 1.0 \
  --norm group --world pipeline --harvest-cache .r5/harvest_tier_320.npz \
  --n-ids 300 --steps 12000 --batch 64 --lr 1e-3 --lr-schedule cosine \
  --augmentation default \
  --init-from deep_insight_face_tpu/weights/embedder_synth_mobilenetv2_gn.npz \
  --distill-from deep_insight_face_tpu/weights/embedder_synth_resnet50v2.npz \
  --distill-weight 4.0 \
  --output .r5/embedder_tier_distill.npz > .r5/tier_train.log 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "train failed rc=$rc" >> .r5/tier_train.log; touch .r5/tier_queue.done; exit 1; fi
python scripts/e2e_quality.py --size 320 --detector-input 320 \
  --backbone mobilenetv2 --norm group \
  --embedder-weights .r5/embedder_tier_distill.npz \
  --output .r5/e2e_tier_distill.json > .r5/e2e_tier_distill.log 2>&1
touch .r5/tier_queue.done
