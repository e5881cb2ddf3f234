#!/bin/bash
cd /root/repo
env -u JAX_PLATFORMS -u PYTHONPATH JAX_PLATFORM_NAME=cpu \
python scripts/train_detector_weights.py --variant full --steps 4 \
  --train-n 6 --eval-n 2 --batch 2 --input-size 416 --snapshot-every 0 \
  --output .r5/full_smoke.npz > .r5/full_smoke.log 2>&1
echo "rc=$?" >> .r5/full_smoke.log
touch .r5/full_smoke.done
