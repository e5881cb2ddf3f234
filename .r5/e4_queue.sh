#!/bin/bash
# Waits for the lm_queue (landmark evals + full-variant training), then
# trains e4: occlusion-consistency self-distillation. Teacher == init ==
# hardft2: the student sees random-erased crops while being cosine-pulled
# toward the teacher's embedding of the SAME un-augmented crop (the
# clean-teacher trick that took the serving tier 0.77 -> 0.966), with
# ArcFace holding the class structure. Evaluated with the hard-retrained
# landmarks on both protocols.
cd /root/repo
while [ ! -f .r5/full_queue.done ]; do sleep 20; done

python scripts/train_embedder_weights.py --backbone resnet50v2 --width 1.0 \
  --world pipeline --harvest-cache .r5/harvest_hard_flagship.npz \
  --n-ids 400 --steps 12000 --batch 64 --lr 2e-4 --lr-schedule cosine \
  --augmentation occlusion \
  --init-from .r5/embedder_resnet_hardft2.npz \
  --distill-from .r5/embedder_resnet_hardft2.npz --distill-weight 4.0 \
  --output .r5/embedder_resnet_e4.npz > .r5/e4_train.log 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "train failed rc=$rc" >> .r5/e4_train.log; touch .r5/e4_queue.done; exit 1; fi

python scripts/e2e_quality.py --hard \
  --landmark-weights .r5/landmark_68_hard.npz \
  --embedder-weights .r5/embedder_resnet_e4.npz \
  --output .r5/e2e_hard_e4.json > .r5/e2e_hard_e4.log 2>&1
python scripts/e2e_quality.py \
  --landmark-weights .r5/landmark_68_hard.npz \
  --embedder-weights .r5/embedder_resnet_e4.npz \
  --output .r5/e2e_std_e4.json > .r5/e2e_std_e4.log 2>&1
touch .r5/e4_queue.done
