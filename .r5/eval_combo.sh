#!/bin/bash
cd /root/repo
python scripts/e2e_quality.py --hard \
  --detector-weights .r5/detector_tiny_mx_hardnoise.npz \
  --embedder-weights .r5/embedder_resnet_hard.npz \
  --output .r5/e2e_hard_combo.json > .r5/e2e_hard_combo.log 2>&1
python scripts/e2e_quality.py \
  --detector-weights .r5/detector_tiny_mx_hardnoise.npz \
  --embedder-weights .r5/embedder_resnet_hard.npz \
  --output .r5/e2e_std_combo.json > .r5/e2e_std_combo.log 2>&1
touch .r5/eval_combo.done
