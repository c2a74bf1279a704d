#!/bin/bash
# Fold x backbone sweep for the supervised image classifiers
# (reference: scripts/train_image.sh).
set -euo pipefail
PREFIX=${PREFIX:-./data/FASTVISION-plus/fold}

for id in {1..5}; do
  for card in resnet18 resnet50 densenet121 densenet169 \
              efficientnet_b0 efficientnet_b1 vit_small_16 vit_small_32; do
    python3 scripts/train_image.py --dataset "${PREFIX}${id}" \
        --modelcard "model_cards/image/${card}.yaml"
  done
done
