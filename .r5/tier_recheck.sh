#!/bin/bash
cd /root/repo
while [ ! -f .r5/e4_queue.done ]; do sleep 20; done
python scripts/e2e_quality.py --size 320 --detector-input 320 \
  --backbone mobilenetv2 --norm group \
  --output .r5/e2e_tier_final.json > .r5/e2e_tier_final.log 2>&1
touch .r5/tier_recheck.done
