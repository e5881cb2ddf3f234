#!/bin/bash
cd /root/repo
python scripts/train_embedder_weights.py --backbone resnet50v2 --width 1.0 \
  --world pipeline --harvest-cache .r5/harvest_hard_flagship.npz \
  --n-ids 400 --steps 12000 --batch 64 --lr 3e-4 --lr-schedule cosine \
  --augmentation occlusion \
  --init-from .r5/embedder_resnet_hardft.npz \
  --output .r5/embedder_resnet_hardft2.npz > .r5/e2_train.log 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "train failed rc=$rc" >> .r5/e2_train.log; touch .r5/e2_queue.done; exit 1; fi
python scripts/e2e_quality.py --hard \
  --detector-weights .r5/detector_tiny_mx_hardnoise.npz \
  --embedder-weights .r5/embedder_resnet_hardft2.npz \
  --output .r5/e2e_hard_e2.json > .r5/e2e_hard_e2.log 2>&1
python scripts/e2e_quality.py \
  --detector-weights .r5/detector_tiny_mx_hardnoise.npz \
  --embedder-weights .r5/embedder_resnet_hardft2.npz \
  --output .r5/e2e_std_e2.json > .r5/e2e_std_e2.log 2>&1
touch .r5/e2_queue.done
