#!/bin/bash
# Occlusion-consistency distillation anchored to the STD-PERFECT shipped
# flagship: init = teacher = embedder_synth_resnet50v2 (std e2e TAR 1.0),
# student sees random-erased crops, cosine-pulled to the teacher's clean
# embedding; ArcFace holds class structure. Candidate pool at the end:
# {shipped, hardft2, e4 (hardft2-anchored), e5 (shipped-anchored)}.
cd /root/repo
while [ ! -f .r5/tier_recheck.done ]; do sleep 20; done
python scripts/train_embedder_weights.py --backbone resnet50v2 --width 1.0 \
  --world pipeline --harvest-cache .r5/harvest_hard_flagship.npz \
  --n-ids 400 --steps 12000 --batch 64 --lr 2e-4 --lr-schedule cosine \
  --augmentation occlusion \
  --init-from deep_insight_face_tpu/weights/embedder_synth_resnet50v2.npz \
  --distill-from deep_insight_face_tpu/weights/embedder_synth_resnet50v2.npz \
  --distill-weight 4.0 \
  --output .r5/embedder_resnet_e5.npz > .r5/e5_train.log 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "train failed rc=$rc" >> .r5/e5_train.log; touch .r5/e5_queue.done; exit 1; fi
python scripts/e2e_quality.py --hard \
  --embedder-weights .r5/embedder_resnet_e5.npz \
  --output .r5/e2e_hard_e5.json > .r5/e2e_hard_e5.log 2>&1
python scripts/e2e_quality.py \
  --embedder-weights .r5/embedder_resnet_e5.npz \
  --output .r5/e2e_std_e5.json > .r5/e2e_std_e5.log 2>&1
touch .r5/e5_queue.done
