#!/bin/bash
cd /root/repo
env -u JAX_PLATFORMS -u PYTHONPATH JAX_PLATFORM_NAME=cpu \
python scripts/train_embedder_weights.py --backbone mobilenetv2 --width 0.5 \
  --world pipeline --scene-size 320 --detector-input 320 --render-workers 8 \
  --n-ids 300 --per-id 14 --steps 8 --no-save \
  --harvest-cache .r5/harvest_tier_320.npz > .r5/tier_harvest.log 2>&1
touch .r5/tier_harvest.done
