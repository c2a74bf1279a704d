#!/bin/bash
# Fold x encoder sweep for the supervised profile classifiers
# (reference: scripts/train_profile.sh).
set -euo pipefail
PREFIX=${PREFIX:-./data/FASTVISION-plus/fold}

for id in {1..5}; do
  for card in cnn_1 cnn_2 transformer_1 transformer_2 lstm_1 lstm_2; do
    python3 scripts/train_profile.py --dataset "${PREFIX}${id}" \
        --modelcard "model_cards/profile/${card}.yaml"
  done
done
