#!/bin/bash
# Final proof for the full Darknet-53 variant: the REAL serving path
# (detect -> NMS -> landmarks -> align -> embed) through e2e_quality.
cd /root/repo
while [ ! -f .r5/e5_queue.done ]; do sleep 20; done
python scripts/e2e_quality.py --hard --detector-variant full \
  --detector-weights .r5/detector_full_hard.npz \
  --output .r5/e2e_hard_full.json > .r5/e2e_hard_full.log 2>&1
touch .r5/full_e2e.done
