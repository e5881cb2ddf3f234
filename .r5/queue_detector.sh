#!/bin/bash
# wait for flagship embedder training to finish, then retrain detector
while kill -0 $(cat /root/repo/.r5/embed_hard2.pid) 2>/dev/null; do sleep 20; done
cd /root/repo
python scripts/train_detector_weights.py --variant tiny_mx --steps 3000 \
  --train-n 1200 --eval-n 96 --faceless-frac 0.2 --rotation-range 0.5 \
  --occlude 0.4 --scene-cache .r5/scenes_hard_noise_416.npz \
  --output .r5/detector_tiny_mx_hardnoise.npz > .r5/detector_hardnoise.log 2>&1
touch .r5/detector_hardnoise.done
