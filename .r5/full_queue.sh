#!/bin/bash
# Waits for the tier queue, then proves the full Darknet-53 3-scale
# variant trains end-to-end on the merged hard scene cache (VERDICT #5).
cd /root/repo
while [ ! -f .r5/tier_queue.done ]; do sleep 20; done
python scripts/train_detector_weights.py --variant full --steps 3000 \
  --train-n 2496 --eval-n 96 --batch 16 --input-size 416 \
  --faceless-frac 0.2 --rotation-range 0.5 --occlude 0.4 \
  --scene-cache .r5/scenes_hard_merged_shuf_416.npz \
  --output .r5/detector_full_hard.npz > .r5/full_train.log 2>&1
echo "rc=$?" >> .r5/full_train.log
touch .r5/full_queue.done
